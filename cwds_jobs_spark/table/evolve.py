"""Schema evolution rules for the MERGE path (SURVEY.md §1.3).

The reference handles schema change only by full reindex (jobs-common/
.../elastic/ElasticsearchService.java:74-91 creates a fresh index from
the current mapping; the alias swap publishes it).  The new engine does
in-place evolution instead, Iceberg-style: added columns null-fill old
data; numeric types widen (int→long, float→double); anything else is
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


def merge_schemas(current: T.StructType, incoming: T.StructType) -> T.StructType:
    """Current schema ∪ incoming schema with widening; stable field order.

    Existing fields keep their position; brand-new incoming fields are
    appended in incoming order.  Result is ``current`` itself when
    nothing changed (callers compare identity-ish via equality).
    """
    cur = {f.name: f for f in current.fields}
    out: list[T.StructField] = []
    for f in current.fields:
        inc = next((g for g in incoming.fields if g.name == f.name), None)
        if inc is None or inc.dataType == f.dataType:
            out.append(f)
            continue
        key = (f.dataType.typeName(), inc.dataType.typeName())
        if key in _WIDEN:
            out.append(T.StructField(f.name, _WIDEN[key], True))
        else:
            raise SchemaEvolutionError(
                f"cannot evolve column {f.name!r}: "
                f"{f.dataType.simpleString()} -> {inc.dataType.simpleString()}"
            )
    for g in incoming.fields:
        if g.name not in cur:
            out.append(T.StructField(g.name, g.dataType, True))
    merged = T.StructType(out)
    return current if merged == current else merged
