"""Schema evolution rules for the MERGE path (SURVEY.md §1.3).

The reference handles schema change only by full reindex (jobs-common/
.../elastic/ElasticsearchService.java:74-91 creates a fresh index from
the current mapping; the alias swap publishes it).  The new engine does
in-place evolution instead, Iceberg-style: added columns null-fill old
data; numeric types widen (int→long, float→double); struct payloads
evolve recursively (new nested fields append, nested numerics widen —
the reference's sink documents are deeply nested JSON, e.g.
jobs-facilities-cws/src/test/resources/fixtures/cwsrs_new_facility.json);
array element types evolve by the same rules; anything else is
rejected loudly.
"""

from __future__ import annotations

from pyspark.sql import types as T

_WIDEN: dict[tuple[str, str], T.DataType] = {
    ("integer", "long"): T.LongType(),
    ("long", "integer"): T.LongType(),
    ("short", "integer"): T.IntegerType(),
    ("integer", "short"): T.IntegerType(),
    ("short", "long"): T.LongType(),
    ("long", "short"): T.LongType(),
    ("float", "double"): T.DoubleType(),
    ("double", "float"): T.DoubleType(),
    ("integer", "double"): T.DoubleType(),
    ("long", "double"): T.DoubleType(),
    ("double", "integer"): T.DoubleType(),
    ("double", "long"): T.DoubleType(),
}


class SchemaEvolutionError(ValueError):
    pass


def merge_types(name: str, cur: T.DataType, inc: T.DataType) -> T.DataType:
    """Unify two column types under the evolution rules; raises
    SchemaEvolutionError for anything that isn't equal, widenable, or
    a recursively-evolvable struct/array."""
    if cur == inc:
        return cur
    if isinstance(cur, T.StructType) and isinstance(inc, T.StructType):
        return merge_schemas(cur, inc)
    if isinstance(cur, T.ArrayType) and isinstance(inc, T.ArrayType):
        el = merge_types(f"{name}[]", cur.elementType, inc.elementType)
        return T.ArrayType(el, cur.containsNull or inc.containsNull)
    if isinstance(cur, T.MapType) and isinstance(inc, T.MapType):
        k = merge_types(f"{name}<key>", cur.keyType, inc.keyType)
        v = merge_types(f"{name}<value>", cur.valueType, inc.valueType)
        return T.MapType(k, v, cur.valueContainsNull or inc.valueContainsNull)
    key = (cur.typeName(), inc.typeName())
    if key in _WIDEN:
        return _WIDEN[key]
    raise SchemaEvolutionError(
        f"cannot evolve column {name!r}: "
        f"{cur.simpleString()} -> {inc.simpleString()}"
    )


def merge_schemas(current: T.StructType, incoming: T.StructType) -> T.StructType:
    """Current schema ∪ incoming schema with widening; stable field order.

    Existing fields keep their position; brand-new incoming fields are
    appended in incoming order.  Applies recursively inside struct
    payload columns (nested field-add + widening).  Result is
    ``current`` itself when nothing changed (callers compare
    identity-ish via equality).
    """
    cur = {f.name: f for f in current.fields}
    out: list[T.StructField] = []
    for f in current.fields:
        inc = next((g for g in incoming.fields if g.name == f.name), None)
        if inc is None or inc.dataType == f.dataType:
            out.append(f)
            continue
        merged_t = merge_types(f.name, f.dataType, inc.dataType)
        out.append(T.StructField(f.name, merged_t, True))
    for g in incoming.fields:
        if g.name not in cur:
            out.append(T.StructField(g.name, g.dataType, True))
    merged = T.StructType(out)
    return current if merged == current else merged
