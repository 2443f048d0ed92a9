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


def test_lww_dedup_contract_holds_for_evolved_nested_schema(spark):
    """The Iceberg MERGE source contract is payload-shape-agnostic: a
    batch with an evolved NESTED payload (added struct field + widened
    nested numeric — the round-2 evolution fixtures) must dedup to one
    winner per key with the nested struct passed through intact, since
    ``UPDATE SET * / INSERT *`` copies every source column including
    structs."""
    import datetime as dt

    from pyspark.sql import types as T

    props = T.StructType(
        [
            T.StructField("rating", T.LongType()),
            T.StructField("labels", T.ArrayType(T.StringType())),
            T.StructField("reviewer", T.StringType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType()),
            T.StructField("props", props),
            T.StructField("op", T.StringType(), False),
            T.StructField("op_ts", T.TimestampType(), False),
            T.StructField("lsn", T.LongType(), False),
        ]
    )
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "v1", (3, ["a"], None), "I", t0, 1),
        ("c1", 0, "v2", (4, ["a", "b"], "rev"), "U", t0, 2),  # winner
        ("c2", 1, "w1", (9, [], "r2"), "I", t0, 3),           # winner
    ]
    deduped = lww_dedup(spark.createDataFrame(rows, schema))
    # full evolved column set, nested struct type preserved
    assert deduped.columns == [f.name for f in schema.fields]
    assert deduped.schema["props"].dataType == props
    got = {r.conv_id: r for r in deduped.collect()}
    assert len(got) == 2
    assert got["c1"].lsn == 2 and got["c1"].props.reviewer == "rev"
    assert got["c1"].props.rating == 4 and got["c1"].props.labels == ["a", "b"]
    assert got["c2"].props.asDict() == {"rating": 9, "labels": [], "reviewer": "r2"}


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
