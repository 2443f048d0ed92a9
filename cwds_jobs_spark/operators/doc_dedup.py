"""Document deduplication at corpus scale.

Four tiers, all expressed as DataFrame programs (one shuffle each where
possible; no per-row Python except the SimHash bit-twiddling, which is
an Arrow-vectorized pandas UDF):

- exact:      hash-groupBy on canonical text (one shuffle)
- minhash+LSH: shingle → k minhashes → b bands → bucket join →
              Jaccard verify on candidates only
- simhash:    64-bit simhash, banded into 4×16-bit chunks → candidates
              → Hamming verify (bit_count(xor))
- n-gram Jaccard: exact verify used standalone for small candidate sets

Scale notes: candidate generation is always *bucket-local* (groupBy on
band/chunk values) so the shuffle volume is O(docs × bands), never the
O(n²) cross join; verification joins only the candidate pairs back to
the shingle sets.  Hot buckets (boilerplate shingles) are capped by
``max_bucket`` to bound worst-case pair blowup — the same skew defense
as the CDC salting, applied to near-dup mining.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from cwds_jobs_spark.functions.canon import canonical_text_col


# ---------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct canonical text: keeper id + duplicate count."""
    return (
        df.select(
            F.md5(canonical_text_col(text_col)).alias("text_hash"),
            F.col(id_col).cast("long").alias(id_col),
        )
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ------------------------------------------------------------- shingles

def shingles(df: DataFrame, text_col: str = "text", n: int = 3,
             out_col: str = "shingles") -> DataFrame:
    """Distinct word n-gram shingles per doc — native, no UDF."""
    toks = F.split(F.lower(canonical_text_col(text_col)), r"\s+")
    k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return df.withColumn(
        out_col, F.when(k > 0, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))
    )


def ngram_jaccard(a_col: str, b_col: str):
    inter = F.size(F.array_intersect(F.col(a_col), F.col(b_col)))
    union = F.size(F.array_union(F.col(a_col), F.col(b_col)))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# ------------------------------------------------------------- minhash

def shingle_hashes(shingle_col: str, seed: int = 7):
    """Hash each shingle string ONCE to a long (the expensive pass)."""
    return F.transform(F.col(shingle_col), lambda s: F.xxhash64(s, F.lit(seed)))


def minhash_signature_from_hashes(hash_col: str, num_hashes: int = 32):
    """array<long> of k minhashes from pre-hashed shingles.

    The k-member hash family re-hashes the 8-byte long
    (``xxhash64(h, i)``) instead of the original string — one string
    pass total + k cheap long passes, ~10x less hashing work than
    k string passes.
    """
    col = F.col(hash_col)
    empty = F.size(col) == 0
    mins = [
        F.array_min(F.transform(col, lambda h, i=i: F.xxhash64(h, F.lit(i))))
        for i in range(num_hashes)
    ]
    return F.when(empty, F.lit(None)).otherwise(F.array(*mins))


def minhash_signature(shingle_col: str, num_hashes: int = 32, seed: int = 7):
    """Back-compat wrapper: string shingles -> k minhashes directly.
    Callers on the hot path should materialize :func:`shingle_hashes`
    in a separate projection first so the string pass runs once."""
    col = F.col(shingle_col)
    empty = F.size(col) == 0
    base = F.transform(col, lambda s: F.xxhash64(s, F.lit(seed)))
    mins = [
        F.array_min(F.transform(base, lambda h, i=i: F.xxhash64(h, F.lit(i))))
        for i in range(num_hashes)
    ]
    return F.when(empty, F.lit(None)).otherwise(F.array(*mins))


def minhash_lsh_candidates(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 50,
    seed: int = 7,
    pre_shingled: bool = False,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded minhash LSH.

    ``pre_shingled=True`` takes ``df`` as ``(id_col, shingles)`` rows
    (e.g. a cached shingle table) instead of raw text.
    """
    rows_per_band = num_hashes // bands
    shingled = (
        df.select(id_col, "shingles")
        if pre_shingled
        else shingles(df.select(id_col, text_col), text_col, n=shingle_n)
    )
    sig = (
        shingled
        # separate projections: the string-hash pass materializes once,
        # the k min-passes then run over longs (CollapseProject keeps
        # expensive exprs from being duplicated across references)
        .withColumn("_bh", shingle_hashes("shingles", seed))
        .withColumn("sig", minhash_signature_from_hashes("_bh", num_hashes))
        .drop("_bh")
        .filter(F.col("sig").isNotNull())
    )
    band_vals = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(",", *[
                        F.element_at("sig", b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ])
                ).alias("bhash"),
            )
            for b in range(bands)
        ]
    )
    exploded = (
        sig.select(F.col(id_col).alias("id"), F.explode(band_vals).alias("bv"))
        .select("id", F.col("bv.band").alias("band"), F.col("bv.bhash").alias("bhash"))
    )
    buckets = (
        exploded.groupBy("band", "bhash")
        .agg(F.collect_list("id").alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            "ids",
                            lambda a: F.transform(
                                "ids", lambda b: F.struct(a.alias("id_a"), b.alias("id_b"))
                            ),
                        )
                    ),
                    lambda p: p["id_a"] < p["id_b"],
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    return pairs


def minhash_near_dups(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    **kw,
) -> DataFrame:
    """LSH candidates verified by exact n-gram Jaccard ≥ threshold.

    Shingling runs once and is cached for the run: the candidate pass
    and both sides of the verification join reuse it instead of
    re-shingling the corpus three times.
    """
    sh = shingles(
        df.select(id_col, text_col), text_col, n=kw.get("shingle_n", 3)
    ).select(id_col, "shingles").persist()
    try:
        sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
        sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
        cand = minhash_lsh_candidates(sh, id_col=id_col, pre_shingled=True, **kw)
        return (
            cand.join(sh_a, "id_a")
            .join(sh_b, "id_b")
            .withColumn("jaccard", F.round(ngram_jaccard("sh_a", "sh_b"), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
            .localCheckpoint()  # materialize before unpersisting the shingle cache
        )
    finally:
        sh.unpersist()


# -------------------------------------------------------------- simhash

@pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (Arrow-batched).

    Token hashes use blake2b-8 — deterministic across processes and
    executors (unlike the salted builtin ``hash``)."""
    import hashlib

    shifts = np.arange(64, dtype=np.uint64)
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = t.lower().split()
        if not toks:
            continue
        hs = np.frombuffer(
            b"".join(
                hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest()
                for w in toks
            ),
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
        v = bits.sum(axis=0) * 2 - len(toks)
        sig = np.packbits((v > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
        out[i] = np.int64(sig)
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    return df.withColumn(out_col, _simhash64(canonical_text_col(text_col)))


def simhash_near_dups(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 100,
) -> DataFrame:
    """Near-dups by SimHash: band the 64 bits into 4×16-bit chunks —
    any pair within Hamming ≤ 3 shares at least one exact chunk
    (pigeonhole) — then verify with bit_count(xor)."""
    sh = simhash(df.select(id_col, text_col), text_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), c * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("val"),
            )
            for c in range(4)
        ]
    )
    ex = sh.select(
        F.col(id_col).alias("id"), F.col("simhash"), F.explode(chunks).alias("cv")
    ).select("id", "simhash", "cv.chunk", "cv.val")
    b = (
        ex.groupBy("chunk", "val")
        .agg(F.collect_list(F.struct("id", "simhash")).alias("xs"))
        .filter((F.size("xs") > 1) & (F.size("xs") <= max_bucket))
    )
    pairs = (
        b.select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            "xs",
                            lambda a: F.transform(
                                "xs",
                                lambda c: F.struct(
                                    a["id"].alias("id_a"),
                                    c["id"].alias("id_b"),
                                    a["simhash"].alias("h_a"),
                                    c["simhash"].alias("h_b"),
                                ),
                            ),
                        )
                    ),
                    lambda p: p["id_a"] < p["id_b"],
                )
            ).alias("p")
        )
        .select("p.*")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs
