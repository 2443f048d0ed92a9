"""Doc dedup tiers vs brute-force oracles on small corpora."""

import itertools

from pyspark.sql import functions as F

from cwds_jobs_spark.operators.doc_dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_near_dups,
    ngram_jaccard,
    shingles,
    simhash_near_dups,
)


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, "  " + base.replace("  ", " ") + "  "),  # ws-variant dup of 1
        (4, base.replace("dog", "cat")),  # near-dup
        (5, "completely different text about spark catalyst optimizer internals"),
        (6, "completely different text about spark tungsten execution internals"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_jaccard(spark, df, n=3):
    sh = {r.doc_id: set(r.shingles) for r in shingles(df, n=n).collect()}
    out = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        u = sh[a] | sh[b]
        out[(a, b)] = (len(sh[a] & sh[b]) / len(u)) if u else 0.0
    return out


def test_exact_dedup(spark):
    out = exact_dedup(_corpus(spark)).collect()
    groups = {r.keeper_id: r.n_copies for r in out}
    assert groups[1] == 3  # docs 1,2,3 collapse (canonical text equal)
    assert groups[4] == 1 and groups[5] == 1


def test_minhash_candidates_include_true_near_dups(spark):
    df = _corpus(spark)
    truth = {p for p, j in _brute_jaccard(spark, df).items() if j >= 0.7}
    cand = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(df).collect()}
    assert truth <= cand  # no false negatives at this threshold/banding


def test_minhash_near_dups_verified(spark):
    df = _corpus(spark)
    got = {(r.id_a, r.id_b): r.jaccard for r in minhash_near_dups(df, threshold=0.7).collect()}
    truth = {p: j for p, j in _brute_jaccard(spark, df).items() if j >= 0.7}
    assert set(got) == set(truth)
    for p in got:
        assert abs(got[p] - truth[p]) < 1e-4


def test_simhash_finds_small_edits(spark):
    df = _corpus(spark)
    pairs = {(r.id_a, r.id_b) for r in simhash_near_dups(df, max_hamming=6).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs  # identical canonical text
    assert (1, 4) in pairs  # one-word edit
    assert (1, 5) not in pairs


def test_ngram_jaccard_column(spark):
    df = shingles(_corpus(spark).filter("doc_id in (1,4)"))
    a = df.filter("doc_id=1").select(F.col("shingles").alias("sa"))
    b = df.filter("doc_id=4").select(F.col("shingles").alias("sb"))
    j = a.crossJoin(b).select(ngram_jaccard("sa", "sb").alias("j")).collect()[0].j
    assert 0.5 < j < 1.0


def test_simhash_order2_matches_order1(spark):
    # same corpus, generous caps: chunk-pair banding must return the
    # exact same verified pair set as single-chunk banding (pigeonhole
    # order only changes candidate generation, never the verify)
    df = _corpus(spark)
    p1 = {(r.id_a, r.id_b, r.hamming)
          for r in simhash_near_dups(df, max_hamming=6).collect()}
    p2 = {(r.id_a, r.id_b, r.hamming)
          for r in simhash_near_dups(
              df, max_hamming=6, pigeonhole_order=2).collect()}
    assert p1 == p2 and p1


def test_simhash_order2_survives_bucket_saturation(spark):
    # 8-bit single chunks have only 256 values per position: force a
    # corpus big enough that every order-1 bucket overflows a tiny cap
    # (the silent candidate dry-up seen at the 500k-doc scale step),
    # and assert the chunk-pair banding still finds the planted dup
    from cwds_jobs_spark.synth import synth_docs

    docs = synth_docs(spark, 4000, num_partitions=8)
    cap = 2  # << 4000/256 so every single-chunk bucket overflows
    order1 = simhash_near_dups(
        docs, max_hamming=6, max_bucket=cap).count()
    order2 = simhash_near_dups(
        docs, max_hamming=6, max_bucket=cap, pigeonhole_order=2).count()
    assert order1 == 0           # the saturation failure mode, pinned
    assert order2 > 200          # planted (10k, 10k+1) pairs recovered


def test_simhash_order2_rejects_insufficient_chunks(spark):
    import pytest as _pytest

    df = _corpus(spark)
    with _pytest.raises(AssertionError):
        simhash_near_dups(
            df, max_hamming=7, n_chunks=8, pigeonhole_order=2
        ).collect()
