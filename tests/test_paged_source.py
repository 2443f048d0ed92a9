"""Paginated REST-style sources (SURVEY §2.1 S6) — token-chain and
indexed-page adapters against a deterministic fake API."""

import pytest
from pyspark.sql import types as T

from cwds_jobs_spark.sources.paged import read_indexed_paged, read_token_paged

USER_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("racf_id", T.StringType(), True),
        T.StructField("page", T.IntegerType(), False),
    ]
)

N_PAGES, PER_PAGE = 9, 40


def _page_rows(p: int) -> list[tuple]:
    return [
        (f"u{p:03d}_{i:03d}", f" RACF{p * PER_PAGE + i} ", p)
        for i in range(PER_PAGE)
    ]


def make_indexed_fetch():
    """Factory returning a NESTED function: cloudpickle serializes it
    by value, so executors don't need this test module importable
    (a module-level function would pickle by reference and fail)."""
    n_pages, per = N_PAGES, PER_PAGE

    def fetch(p: int) -> list[tuple]:
        if p >= n_pages:
            return []
        return [
            (f"u{p:03d}_{i:03d}", f" RACF{p * per + i} ", p)
            for i in range(per)
        ]

    return fetch


def fake_token_fetch(token):
    p = 0 if token is None else int(token)
    rows = _page_rows(p)
    nxt = str(p + 1) if p + 1 < N_PAGES else None
    return rows, nxt


def test_token_paged_reads_all_pages(spark, tmp_path):
    df = read_token_paged(
        spark,
        fake_token_fetch,
        USER_SCHEMA,
        spool_dir=str(tmp_path / "spool"),
        pages_per_spool=4,  # forces multiple spool flushes
    )
    assert df.count() == N_PAGES * PER_PAGE
    assert df.select("page").distinct().count() == N_PAGES
    # it's a real distributed frame over the spool, not driver rows
    assert df.rdd.getNumPartitions() >= 1


def test_token_paged_empty_source(spark, tmp_path):
    df = read_token_paged(
        spark,
        lambda token: ([], None),
        USER_SCHEMA,
        spool_dir=str(tmp_path / "spool"),
    )
    assert df.count() == 0 and df.schema == USER_SCHEMA


def test_token_paged_loop_guard(spark, tmp_path):
    with pytest.raises(RuntimeError, match="max_pages"):
        read_token_paged(
            spark,
            lambda token: ([], "again"),  # never terminates
            USER_SCHEMA,
            spool_dir=str(tmp_path / "spool"),
            max_pages=5,
        )


def test_indexed_paged_distributed_fetch(spark):
    df = read_indexed_paged(
        spark, make_indexed_fetch(), USER_SCHEMA, n_pages=N_PAGES, tasks=4
    )
    assert df.rdd.getNumPartitions() == 4  # fetch parallelism = tasks
    assert df.count() == N_PAGES * PER_PAGE
    got = {r.user_id for r in df.collect()}
    assert len(got) == N_PAGES * PER_PAGE


def test_paged_source_feeds_merge_pipeline(spark, tmp_path):
    """S6 → engine integration: the snapshot DataFrame unions into the
    normal change window and canonicalization trims the RACF ids
    (reference CwsChangedUsersServiceImpl.java:40 String::trim)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cwds_jobs_spark.operators.merge import merge_apply
    from cwds_jobs_spark.table.snapshot import SnapshotTable

    src = read_indexed_paged(
        spark, make_indexed_fetch(), USER_SCHEMA, n_pages=N_PAGES, tasks=4
    )
    changes = src.select(
        F.col("user_id").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("I").alias("op"),
        F.lit(dt.datetime(2024, 1, 1)).alias("op_ts"),
        F.monotonically_increasing_id().alias("lsn"),
        F.lit("user").alias("role"),
        F.trim("racf_id").alias("text"),
    )
    tschema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), tschema, num_buckets=4)
    merge_apply(tbl, changes.persist(), job_id="s6", batch_id=0)
    out = tbl.read()
    assert out.count() == N_PAGES * PER_PAGE
    assert not [r for r in out.collect() if r.text != r.text.strip()]
