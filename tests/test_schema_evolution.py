"""Schema evolution mid-stream (SURVEY.md §1.3, FIXTURES.md §2):
added `tool` column + int→long widening; old buckets are NOT
rewritten — the read path null-fills and casts (Iceberg-style)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cwds_jobs_spark.operators.merge import merge_apply
from cwds_jobs_spark.schema import CHANGES_SCHEMA, CHANGES_SCHEMA_V0
from cwds_jobs_spark.synth import synth_changes
from cwds_jobs_spark.table.evolve import SchemaEvolutionError, merge_schemas
from cwds_jobs_spark.table.snapshot import SnapshotTable

TRANSCRIPTS_V0 = T.StructType(
    [f for f in CHANGES_SCHEMA_V0.fields if f.name not in ("op", "op_ts", "lsn")]
)


def test_added_column_null_fills_old_rows(spark, ws):
    tbl = SnapshotTable.create(spark, ws["table"], TRANSCRIPTS_V0, num_buckets=4)
    v0 = synth_changes(spark, 300, n_convs=10, with_tool_col=False)
    merge_apply(tbl, v0, job_id="j", batch_id=0)
    old_version = tbl.version
    assert "tool" not in tbl.read().columns

    v1 = synth_changes(spark, 300, n_convs=10, start_lsn=300, with_tool_col=True)
    merge_apply(tbl, v1, job_id="j", batch_id=1)
    out = tbl.read()
    assert "tool" in out.columns
    # rows untouched by batch 1 read back with tool = NULL
    touched = {(r.conv_id, r.turn_idx) for r in v1.collect()}
    legacy = [r for r in out.collect() if (r.conv_id, r.turn_idx) not in touched]
    assert legacy and all(r.tool is None for r in legacy)
    assert tbl.version > old_version


def test_unaffected_buckets_not_rewritten_on_evolution(spark, ws):
    tbl = SnapshotTable.create(spark, ws["table"], TRANSCRIPTS_V0, num_buckets=8)
    merge_apply(tbl, synth_changes(spark, 2000, n_convs=100, with_tool_col=False),
                job_id="j", batch_id=0)
    before = {b: tuple(e["files"]) for b, e in tbl._snap["buckets"].items()}
    one = synth_changes(spark, 1, n_convs=1, start_lsn=10**6, with_tool_col=True)
    merge_apply(tbl, one, job_id="j", batch_id=1)
    after = {b: tuple(e["files"]) for b, e in tbl._snap["buckets"].items()}
    unchanged = [b for b in before if after.get(b) == before[b]]
    assert len(unchanged) >= len(before) - 1  # only the touched bucket rewrote
    # and the table still reads fine across two physical schemas
    assert tbl.read().count() > 0


def test_int_to_long_widening(spark, ws):
    tbl = SnapshotTable.create(spark, ws["table"], TRANSCRIPTS_V0, num_buckets=4)
    merge_apply(tbl, synth_changes(spark, 100, n_convs=5, with_tool_col=False),
                job_id="j", batch_id=0)
    wide = synth_changes(spark, 50, n_convs=5, start_lsn=100, with_tool_col=False) \
        .withColumn("turn_idx", F.col("turn_idx").cast("long"))
    merge_apply(tbl, wide, job_id="j", batch_id=1)
    assert dict(tbl.read().dtypes)["turn_idx"] == "bigint"
    # all keys still unique and readable
    out = tbl.read()
    assert out.count() == out.select("conv_id", "turn_idx").distinct().count()


def test_incompatible_evolution_rejected():
    a = T.StructType([T.StructField("x", T.StringType())])
    b = T.StructType([T.StructField("x", T.TimestampType())])
    with pytest.raises(SchemaEvolutionError):
        merge_schemas(a, b)


def test_merge_schemas_stable_when_unchanged():
    assert merge_schemas(TRANSCRIPTS_V0, TRANSCRIPTS_V0) is TRANSCRIPTS_V0
