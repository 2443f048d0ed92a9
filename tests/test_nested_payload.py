"""Nested (struct/array) payload columns through MERGE + evolution.

The reference's sink documents are deeply nested JSON (golden fixture
jobs-facilities-cws/src/test/resources/fixtures/cwsrs_new_facility.json,
SURVEY.md §1.2) — this exercises a StructType payload end-to-end:
nested field-add null-fills old rows, nested numerics widen, and
incompatible nested changes are rejected loudly.
"""

import datetime as dt

import pytest
from pyspark.sql import types as T

from cwds_jobs_spark.operators.merge import merge_apply
from cwds_jobs_spark.table.evolve import (
    SchemaEvolutionError,
    merge_schemas,
    merge_types,
)
from cwds_jobs_spark.table.snapshot import SnapshotTable

PROPS_V0 = T.StructType(
    [
        T.StructField("rating", T.IntegerType()),
        T.StructField("labels", T.ArrayType(T.StringType())),
    ]
)
PROPS_V1 = T.StructType(
    [
        T.StructField("rating", T.LongType()),  # widened
        T.StructField("labels", T.ArrayType(T.StringType())),
        T.StructField("reviewer", T.StringType()),  # added nested field
    ]
)


def _table_schema(props: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType()),
            T.StructField("props", props),
        ]
    )


def _batch_schema(props: T.StructType) -> T.StructType:
    return T.StructType(
        list(_table_schema(props).fields)
        + [
            T.StructField("op", T.StringType(), False),
            T.StructField("op_ts", T.TimestampType(), False),
            T.StructField("lsn", T.LongType(), False),
        ]
    )


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_nested_schema_merge_rules():
    merged = merge_schemas(_table_schema(PROPS_V0), _table_schema(PROPS_V1))
    props = next(f for f in merged.fields if f.name == "props").dataType
    assert isinstance(props, T.StructType)
    assert props["rating"].dataType == T.LongType()
    assert "reviewer" in props.fieldNames()
    # order stable: existing nested fields first, additions appended
    assert props.fieldNames() == ["rating", "labels", "reviewer"]


def test_nested_array_element_widening():
    a = T.ArrayType(T.StructType([T.StructField("n", T.IntegerType())]))
    b = T.ArrayType(
        T.StructType(
            [T.StructField("n", T.LongType()), T.StructField("s", T.StringType())]
        )
    )
    out = merge_types("col", a, b)
    assert out.elementType["n"].dataType == T.LongType()
    assert "s" in out.elementType.fieldNames()


def test_incompatible_nested_change_rejected():
    bad = T.StructType([T.StructField("rating", T.StringType())])
    with pytest.raises(SchemaEvolutionError, match="rating"):
        merge_schemas(_table_schema(PROPS_V0), _table_schema(bad))


def test_nested_payload_through_merge_and_evolution(spark, ws):
    tbl = SnapshotTable.create(
        spark, ws["table"], _table_schema(PROPS_V0), num_buckets=4
    )
    b0 = spark.createDataFrame(
        [
            ("c1", 0, "hello", (3, ["a", "b"]), "I", _ts(0), 0),
            ("c2", 0, "world", (5, []), "I", _ts(0), 1),
        ],
        _batch_schema(PROPS_V0),
    )
    merge_apply(tbl, b0, job_id="n", batch_id=0)

    b1 = spark.createDataFrame(
        [
            ("c1", 1, "again", (4, ["c"], "rev-9"), "I", _ts(1), 2),
            ("c2", 0, "world2", (6, ["x"], "rev-7"), "U", _ts(1), 3),
        ],
        _batch_schema(PROPS_V1),
    )
    merge_apply(tbl, b1, job_id="n", batch_id=1)

    out = {(r.conv_id, r.turn_idx): r for r in tbl.read().collect()}
    assert len(out) == 3
    # legacy row read through the evolved schema: nested field null-filled
    legacy = out[("c1", 0)]
    assert legacy.props.rating == 3
    assert legacy.props.labels == ["a", "b"]
    assert legacy.props.reviewer is None
    # updated row carries the evolved nested payload; LWW picked the U
    assert out[("c2", 0)].text == "world2"
    assert out[("c2", 0)].props.reviewer == "rev-7"
    assert out[("c2", 0)].props.rating == 6
    # evolved table schema is sticky
    props_t = next(f for f in tbl.schema.fields if f.name == "props").dataType
    assert props_t["rating"].dataType == T.LongType()
    assert "reviewer" in props_t.fieldNames()


def test_null_struct_stays_null_through_alignment(spark, ws):
    tbl = SnapshotTable.create(
        spark, ws["table"], _table_schema(PROPS_V0), num_buckets=2
    )
    b0 = spark.createDataFrame(
        [("c1", 0, "t", None, "I", _ts(0), 0)], _batch_schema(PROPS_V0)
    )
    merge_apply(tbl, b0, job_id="n", batch_id=0)
    b1 = spark.createDataFrame(
        [("c9", 0, "t", (1, [], "r"), "I", _ts(1), 1)], _batch_schema(PROPS_V1)
    )
    merge_apply(tbl, b1, job_id="n", batch_id=1)
    row = next(r for r in tbl.read().collect() if r.conv_id == "c1")
    assert row.props is None  # not a struct of all-NULL fields
