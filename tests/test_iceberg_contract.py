"""Static contract tests for the Iceberg production MERGE path.

No Iceberg jar ships in this sandbox, so ``merge_apply_iceberg`` can't
execute here — these tests pin (a) the generated MERGE INTO SQL against
golden text and (b) the schema contract between the ``lww_dedup``
pre-pass and what the MERGE statement consumes, so a cluster deploy
with iceberg-spark-runtime picks up exactly the reviewed statement.
"""

import re

from cwds_jobs_spark.operators.dedup import lww_dedup
from cwds_jobs_spark.operators.merge import iceberg_available, iceberg_merge_sql
from cwds_jobs_spark.schema import CHANGES_SCHEMA
from cwds_jobs_spark.synth import synth_changes


def _squash(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


GOLDEN = _squash(
    """
    MERGE INTO lake.transcripts t
    USING cdc_batch_src s
    ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
    WHEN MATCHED AND s.op = 'D' THEN DELETE
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *
    """
)


def test_iceberg_merge_sql_golden():
    sql = iceberg_merge_sql(
        "lake.transcripts", "cdc_batch_src", ["conv_id", "turn_idx"]
    )
    assert _squash(sql) == GOLDEN


def test_iceberg_merge_sql_single_key():
    sql = iceberg_merge_sql("t1", "src", ["conv_id"])
    assert "ON t.conv_id = s.conv_id" in _squash(sql)
    assert " AND t.turn_idx" not in sql


def test_iceberg_not_available_in_sandbox(spark):
    assert not iceberg_available(spark)


def test_lww_dedup_output_matches_merge_contract(spark):
    """The MERGE source view must expose the key columns, `op` (the
    statement branches on it) and the full payload — i.e. the original
    changes shape, one row per key."""
    batch = synth_changes(spark, 500, n_convs=20)
    deduped = lww_dedup(batch)
    assert deduped.columns == [f.name for f in CHANGES_SCHEMA.fields]
    keys = deduped.select("conv_id", "turn_idx").distinct().count()
    assert deduped.count() == keys  # exactly one winner per key
    # winners really are last-writer: max (op_ts, lsn) per key
    from pyspark.sql import functions as F

    expect = batch.groupBy("conv_id", "turn_idx").agg(
        F.max(F.struct("op_ts", "lsn"))["lsn"].alias("lsn")
    )
    got = deduped.select("conv_id", "turn_idx", "lsn")
    assert got.exceptAll(expect).count() == 0
