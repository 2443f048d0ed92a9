"""Similarity search over embedding columns (array<float>).

- ``cosine_to`` / ``brute_force_topk``: exact top-k vs one query
  vector — a single projection + TakeOrdered, no shuffle of the
  corpus; the correctness baseline.
- ``topk_for_queries``: exact top-k for a *set* of queries — the
  query block is broadcast, per-partition scoring runs as one
  Arrow-batched numpy matmul (mapInPandas), then a per-query top-k
  aggregate.  This is the blocked brute-force layout that saturates
  a cluster: corpus stays partitioned, O(|corpus| × |queries|) flops
  vectorized, shuffle only of per-partition top-k candidates.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane signatures
  put corpus and queries into Hamming buckets; only same-bucket pairs
  are scored (approximate; recall grows with num_tables).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_to(vec_col: str, query: list[float]):
    """Native cosine similarity column vs a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x))
    nq = float(np.sqrt(np.sum(np.asarray(query, dtype="float64") ** 2)))
    return F.when(nv > 0, dot / (nv * F.lit(nq))).otherwise(F.lit(0.0))


def brute_force_topk(
    df: DataFrame, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_to(vec_col, query), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _as_matrix(series: pd.Series) -> np.ndarray:
    return np.vstack(series.map(np.asarray).to_numpy()).astype(np.float64)


def topk_for_queries(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k per query via broadcast queries + numpy matmul.

    Per-partition: one (batch × queries) GEMM inside mapInPandas, emit
    each partition's top-k per query, then a global top-k window over
    the (tiny) candidate set.
    """
    spark = corpus.sparkSession
    qids = [int(q[0]) for q in queries]
    qm = np.vstack([np.asarray(q[1], dtype=np.float64) for q in queries])
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    bc = spark.sparkContext.broadcast((qids, qm, qn, k))

    def score(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qm_, qn_, k_ = bc.value
        for pdf in parts:
            if pdf.empty:
                continue
            m = _as_matrix(pdf[vec_col])
            nv = np.linalg.norm(m, axis=1)
            nv[nv == 0] = 1.0
            sims = (m @ qm_.T) / nv[:, None] / qn_[None, :]
            out = []
            ids = pdf[id_col].to_numpy()
            for j, qid in enumerate(qids_):
                # rank on the ROUNDED similarity with id tiebreak so the
                # partition-level cut agrees with the global window's
                # (cosine DESC, id ASC) order — sub-1e-6 float noise
                # collapses into deterministic id-ordered ties
                r = np.round(sims[:, j], 6)
                top = np.lexsort((ids, -r))[:k_]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            id_col: ids[top],
                            "cosine": r[top],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    cand = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"query_id long, {id_col} long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    *,
    vec_col: str = "embedding",
    sample: int = 10_000,
    iters: int = 8,
    seed: int = 23,
) -> np.ndarray:
    """k-means centroids for IVF partitioning, trained driver-side on a
    bounded sample (Lloyd's on ≤``sample`` vectors — training cost is
    independent of corpus size; assignment below is distributed).

    The sample is a seeded uniform ``df.sample`` (deterministic for a
    fixed seed + partition layout), NOT ``limit`` — a limit takes the
    first rows of whatever partition ordering Spark yields, which on a
    sorted/clustered corpus produces biased centroids.
    """
    n = corpus.count()
    frac = 1.0 if n <= sample else min(1.0, (1.5 * sample) / n)
    sampled = corpus.select(vec_col)
    if frac < 1.0:
        sampled = sampled.sample(withReplacement=False, fraction=frac, seed=seed)
    rows = sampled.limit(sample).toPandas()[vec_col]
    x = np.vstack(rows.map(np.asarray).to_numpy()).astype(np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms  # cosine => spherical k-means on unit vectors
    rs = np.random.RandomState(seed)
    cent = x[rs.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cent)):
            m = x[assign == c]
            if len(m):
                v = m.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_assign(
    corpus: DataFrame, centroids: np.ndarray, *, vec_col: str = "embedding",
    out_col: str = "ivf_cell",
) -> DataFrame:
    """Distributed nearest-centroid assignment — one Arrow-batched
    numpy matmul per partition (mapInPandas), no shuffle."""
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def assign(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent = bc.value
        for pdf in parts:
            if pdf.empty:
                continue
            m = _as_matrix(pdf[vec_col])
            nv = np.linalg.norm(m, axis=1)
            nv[nv == 0] = 1.0
            pdf = pdf.copy()
            pdf[out_col] = np.argmax((m / nv[:, None]) @ cent.T, axis=1)
            yield pdf

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(corpus.schema.fields) + [T.StructField(out_col, T.IntegerType())]
    )
    return corpus.mapInPandas(assign, schema=out_schema)


def ivf_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
    seed: int = 23,
) -> DataFrame:
    """IVF approximate top-k: score only corpus rows whose cell is among
    the query's ``nprobe`` nearest centroids.

    At 100 TB the assignment is a write-once byproduct of ingestion
    (store ``ivf_cell`` as a partition column); queries then prune
    ~(1 - nprobe/n_centroids) of the corpus at the scan.
    """
    spark = corpus.sparkSession
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids, vec_col=vec_col, seed=seed
        )
    assigned = ivf_assign(corpus, centroids, vec_col=vec_col)

    qrows = []
    for qid, qv in queries:
        v = np.asarray(qv, dtype=np.float64)
        n = np.linalg.norm(v)
        if n > 0:
            v = v / n
        cells = np.argsort(-(centroids @ v))[:nprobe]
        for cell in cells:
            qrows.append((int(qid), list(map(float, qv)), int(cell)))
    qdf = spark.createDataFrame(
        qrows, "query_id long, qvec array<double>, ivf_cell int"
    )
    cand = assigned.join(F.broadcast(qdf), "ivf_cell").select(
        "query_id", id_col, vec_col, "qvec"
    )
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("qvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x))
    nq = F.sqrt(F.aggregate(F.col("qvec"), F.lit(0.0), lambda a, x: a + x * x))
    scored = cand.withColumn(
        "cosine",
        F.round(F.when((nv > 0) & (nq > 0), dot / (nv * nq)).otherwise(0.0), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine")
    )


def _cosine_pair(a_col: str, b_col: str):
    """Native cosine between two array columns (fold, no UDF)."""
    dot = F.aggregate(
        F.zip_with(F.col(a_col), F.col(b_col), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(F.col(a_col), F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(F.col(b_col), F.lit(0.0), lambda s, x: s + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_candidate_pairs(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 2,
    num_tables: int = 16,
    seed: int = 11,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Candidate near-dup ``(id_a, id_b)`` pairs via random-hyperplane
    LSH — the COMPACT mining stage: the exploded frame and every
    shuffle downstream of the signature scan carry only
    ``(table, bucket, id)``, never the embedding vectors (the round-2
    version shipped full vectors on both sides of the bucket self-join
    — O(rows × tables × dim × 2) shuffle bytes, the dominant cost at
    corpus scale).

    Pair expansion is a STREAMING self-join of the compact
    ``(table, bucket, id)`` frame on ``(table, bucket)`` with
    ``id_a < id_b`` — pairs flow through the join iterator one at a
    time.  The earlier ``collect_list → transform×transform`` form
    (still used by ``doc_dedup`` where caps are ≤ a few hundred)
    materialized the full B×B struct array inside ONE row's expression
    evaluation: at ``max_bucket=10_000`` a single hot bucket builds
    ~10^8 structs (multi-GB) before the filter prunes it — an executor
    OOM, not a spill.

    ``max_bucket`` drops degenerate hot buckets (a bucket of B rows
    still EMITS B²/2 pairs downstream; with ``n_bits`` too small for
    the corpus a single bucket approaches n/2^n_bits rows).  Size
    ``n_bits`` ≈ log2(corpus / desired_bucket) and raise ``num_tables``
    to buy the recall back.
    """
    dim = len(corpus.select(vec_col).first()[0])
    tables = [_hyperplanes(dim, n_bits, seed + t) for t in range(num_tables)]
    sig = lsh_signatures(corpus, tables, id_col=id_col, vec_col=vec_col)
    exploded = sig.select(
        F.col(id_col).alias("id"),
        F.posexplode("sigs").alias("table", "bucket"),
    )
    keep = (
        exploded.groupBy("table", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
        .select("table", "bucket")
    )
    kept = exploded.join(keep, ["table", "bucket"])
    return (
        kept.select("table", "bucket", F.col("id").alias("id_a"))
        .join(
            kept.select("table", "bucket", F.col("id").alias("id_b")),
            ["table", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def embedding_near_dups(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_bits: int = 2,
    num_tables: int = 16,
    seed: int = 11,
    max_bucket: int = 10_000,
    verify: str = "join",
) -> DataFrame:
    """Near-duplicate PAIRS by embedding cosine ≥ threshold.

    Candidate generation is bucket-local (``embedding_candidate_pairs``
    — ids only through the shuffle, hot buckets capped); verification
    joins each id side back to the single ``(id, vec)`` projection and
    computes the exact native cosine — vectors are shipped once per
    verified pair side, proportional to candidates, not to
    rows × tables.  Candidate volume is O(Σ bucket²) bounded by
    ``max_bucket``, not an O(n²) cross join.  Recall for cos ≥ t is
    1 - (1 - p^n_bits)^num_tables with p = 1 - θ(t)/π; the defaults
    (2 bits × 16 tables) give ≥ 1 - 1e-9 at t = 0.9 — effectively
    exact on an un-capped corpus, which is what the DuckDB all-pairs
    oracle checks.  At corpus scale raise ``n_bits`` (finer buckets,
    more tables) to trade recall for candidate volume.

    ``verify="bucket"`` is the corpus-scale strategy: after the first
    id→vector join the join path drags one vector per CANDIDATE row
    through a sort-merge join — O(candidates × dim) sort bytes (a
    500k-vector step measured ~37 GB sorted, the dominant cost; the
    compact candidate mining itself stays linear).  Bucket verify
    instead ships each vector once per bucket membership — O(rows ×
    tables × dim), linear — and computes all in-bucket cosines as one
    per-group GEMM (``applyInPandas``), so only threshold-SURVIVING
    pairs ever shuffle.  Same candidates, same exact cosine, same
    hot-bucket cap (applied per group); pairs seen in several tables
    collapse via a final output-sized groupBy."""
    if verify == "bucket":
        return _embedding_near_dups_bucket_verify(
            corpus, id_col=id_col, vec_col=vec_col, threshold=threshold,
            n_bits=n_bits, num_tables=num_tables, seed=seed,
            max_bucket=max_bucket,
        )
    cand = embedding_candidate_pairs(
        corpus, id_col=id_col, vec_col=vec_col, n_bits=n_bits,
        num_tables=num_tables, seed=seed, max_bucket=max_bucket,
    )
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(_cosine_pair("va", "vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _embedding_near_dups_bucket_verify(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_bits: int,
    num_tables: int,
    seed: int,
    max_bucket: int,
) -> DataFrame:
    """In-bucket GEMM verification (see ``embedding_near_dups``
    docstring, ``verify="bucket"``).  One shuffle of the exploded
    ``(table, bucket, id, vec)`` frame — rows × tables × dim bytes,
    linear in the corpus — then per-bucket pairwise cosines in numpy;
    only pairs ≥ threshold leave the group."""
    dim = len(corpus.select(vec_col).first()[0])
    tables = [_hyperplanes(dim, n_bits, seed + t) for t in range(num_tables)]
    sig = lsh_signatures(
        corpus, tables, id_col=id_col, vec_col=vec_col, keep_vec=True
    )
    exploded = sig.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.posexplode("sigs").alias("table", "bucket"),
    )
    thr = float(threshold)
    cap = int(max_bucket)

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"),
             "id_b": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}
        )
        if len(pdf) < 2 or len(pdf) > cap:  # hot-bucket cap, per group
            return empty
        m = _as_matrix(pdf["vec"])
        nv = np.linalg.norm(m, axis=1)
        ok = nv > 0  # zero-norm vectors: cosine defined as 0 (< thr)
        nv[~ok] = 1.0
        u = m / nv[:, None]
        c = u @ u.T
        iu, ju = np.triu_indices(len(pdf), k=1)
        cos = np.round(c[iu, ju], 6)
        keep = (cos >= thr) & ok[iu] & ok[ju]
        if not keep.any():
            return empty
        ids = pdf["id"].to_numpy()
        a, b = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cos[keep]})

    pairs = exploded.groupBy("table", "bucket").applyInPandas(
        verify, schema="id_a long, id_b long, cosine double"
    )
    # a pair can surface from several tables; BLAS block order may
    # differ per bucket shape, so collapse on max rather than distinct
    return pairs.groupBy("id_a", "id_b").agg(F.max("cosine").alias("cosine"))


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rs = np.random.RandomState(seed)
    return rs.normal(size=(n_bits, dim))


def lsh_signatures(
    corpus: DataFrame,
    tables: list[np.ndarray],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """All-tables hyperplane signatures in ONE per-partition GEMM.

    Emits ``(id[, vec], sigs: array<long>)`` with ``sigs[t]`` = bucket
    id in table ``t`` (bit i set when dot(vec, plane_i) > 0 — same
    convention as the driver-side query signatures).  One
    ``(batch × dim)·(dim × tables·bits)`` BLAS matmul per Arrow batch
    replaces ``tables × bits`` nested fold expressions: the expression
    tree made Catalyst analysis/codegen the bottleneck (60 s of plan
    time for a 48-plane select at dim 64, independent of row count)
    and per-element fold evaluation is ~100× slower than GEMM per row.
    Narrow map, no shuffle — scale cost is pure flops."""
    from pyspark.sql import types as T

    spark = corpus.sparkSession
    planes = np.vstack(tables).astype(np.float64)  # (tables*bits, dim)
    n_tables, n_bits = len(tables), tables[0].shape[0]
    weights = (1 << np.arange(n_bits)).astype(np.int64)
    bc = spark.sparkContext.broadcast((planes, n_tables, n_bits, weights))

    def sign(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes_, nt, nb, w = bc.value
        for pdf in parts:
            if pdf.empty:
                continue
            m = _as_matrix(pdf[vec_col])
            bits = (m @ planes_.T) > 0  # (batch, tables*bits)
            sigs = bits.reshape(len(pdf), nt, nb) @ w  # (batch, tables)
            out = {id_col: pdf[id_col]}
            if keep_vec:
                out[vec_col] = pdf[vec_col]
            out["sigs"] = list(sigs.astype(np.int64))
            yield pd.DataFrame(out)

    fields = {f.name: f for f in corpus.schema.fields}
    schema = T.StructType(
        [fields[id_col]]
        + ([fields[vec_col]] if keep_vec else [])
        + [T.StructField("sigs", T.ArrayType(T.LongType()))]
    )
    return corpus.select(id_col, vec_col).mapInPandas(sign, schema=schema)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    num_tables: int = 4,
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: score only corpus rows sharing an LSH bucket
    with the query in at least one table."""
    spark = corpus.sparkSession
    dim = len(queries[0][1])
    tables = [_hyperplanes(dim, n_bits, seed + t) for t in range(num_tables)]

    sig = lsh_signatures(
        corpus, tables, id_col=id_col, vec_col=vec_col, keep_vec=True
    )
    # query signatures computed driver-side (tiny)
    qrows = []
    for qid, qv in queries:
        v = np.asarray(qv, dtype=np.float64)
        for t, planes in enumerate(tables):
            bucket = int(((planes @ v) > 0).astype(np.int64) @ (1 << np.arange(n_bits)))
            qrows.append((int(qid), list(map(float, qv)), t, bucket))
    qdf = spark.createDataFrame(
        qrows, "query_id long, qvec array<double>, table int, bucket long"
    )
    exploded = sig.select(
        id_col, vec_col, F.posexplode("sigs").alias("table", "bucket")
    )
    cand = (
        exploded.join(F.broadcast(qdf), ["table", "bucket"])
        .select("query_id", id_col, vec_col, "qvec")
        .dropDuplicates(["query_id", id_col])
    )
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("qvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x))
    nq = F.sqrt(F.aggregate(F.col("qvec"), F.lit(0.0), lambda a, x: a + x * x))
    scored = cand.withColumn(
        "cosine",
        F.round(F.when((nv > 0) & (nq > 0), dot / (nv * nq)).otherwise(0.0), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine")
    )
