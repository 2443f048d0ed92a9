"""Key-partitioned MERGE of a change window into the transcripts table.

Semantics follow the reference's bulk writer (jobs-common/.../elastic/
ElasticWriter.java:67-89): op I/U → full-document upsert by key,
op D → delete by key, unknown key + D → no-op (the reference logs and
skips, ElasticWriter.java:80-82).  Equivalent SQL (runs verbatim on an
Iceberg catalog — see :func:`iceberg_merge_sql`)::

    MERGE INTO transcripts t USING batch s
      ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
    WHEN MATCHED AND s.op = 'D' THEN DELETE
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *

Physical plan (SnapshotTable path, no Iceberg jar in the sandbox):

1. LWW-dedup the window to one winner per key (map-side combinable
   aggregate — skew-immune, see ``operators.dedup``).
2. Bucket-prune: collect the ≤``num_buckets`` distinct bucket ids the
   batch touches; read ONLY those buckets of the target.  Merge cost
   is proportional to the batch footprint, not table size — the
   property that keeps a 10^10-row table mergeable.
3. Anti-join target-side survivors against the (broadcast) batch keys,
   union the non-delete winners, atomically swap the affected buckets.

Exactly-once: the committed-batch ledger inside the snapshot makes a
replayed ``foreachBatch`` delivery a no-op (SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cwds_jobs_spark.lineage import write_lineage
from cwds_jobs_spark.operators.dedup import lww_dedup
from cwds_jobs_spark.schema import OP_DELETE, payload_schema
from cwds_jobs_spark.table.evolve import merge_schemas
from cwds_jobs_spark.table.snapshot import SnapshotTable, _align

BROADCAST_KEYS_MAX = 4_000_000  # batch keys under this → broadcast anti-join


def merge_apply(
    table: SnapshotTable,
    batch_df: DataFrame,
    *,
    job_id: str,
    batch_id: int,
    lineage_dir: str | None = None,
    drop_deletes: bool = False,
) -> dict:
    """Apply one change window; returns per-batch stats.

    ``drop_deletes=True`` is the initial-load mode: D events are
    filtered out entirely, matching the reference's initial queries
    (jobs-facilities-cws/.../QueryConstants.java:42,50 — ``!= 'D'``).
    """
    if batch_id <= table.committed_batch(job_id):
        return {"skipped": True, "batch_id": batch_id, "events": 0}

    if drop_deletes:
        batch_df = batch_df.filter(F.col("op") != OP_DELETE)

    stats = (
        write_lineage(batch_df, lineage_dir, job_id, batch_id)
        if lineage_dir
        else {"events": None}
    )

    deduped = lww_dedup(batch_df, table.key_cols).persist()
    try:
        n_keys = deduped.count()
        if n_keys == 0:
            table.record_ledger(job_id, batch_id)
            return {"skipped": False, "batch_id": batch_id, "events": 0, **stats}

        bucket = table.bucket_of()
        affected = sorted(
            r[0] for r in deduped.select(bucket.alias("b")).distinct().collect()
        )

        cur_schema = table.schema
        incoming_payload = payload_schema(deduped.schema)
        merged = merge_schemas(cur_schema, incoming_payload)
        evolved = merged is not cur_schema

        target = table.read(affected)
        if evolved:
            target = _align(target, merged)

        keys = deduped.select(*table.key_cols)
        if n_keys <= BROADCAST_KEYS_MAX:
            keys = F.broadcast(keys)
        survivors = target.join(keys, on=table.key_cols, how="left_anti")
        upserts = _align(
            deduped.filter(F.col("op") != OP_DELETE).drop("op", "op_ts", "lsn"),
            merged,
        )
        result = survivors.unionByName(upserts)

        table.overwrite_buckets(
            result,
            affected,
            new_schema=merged if evolved else None,
            ledger_update={job_id: batch_id},
        )
        return {
            "skipped": False,
            "batch_id": batch_id,
            "keys": n_keys,
            "affected_buckets": len(affected),
            **stats,
        }
    finally:
        deduped.unpersist()


# ---------------------------------------------------------------------------
# Iceberg catalog path — used on a real cluster with
# iceberg-spark-runtime on the classpath; not executable in this
# sandbox (no jar), kept as the production MERGE implementation.
# ---------------------------------------------------------------------------

def iceberg_merge_sql(target: str, source_view: str, key_cols: list[str]) -> str:
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    return f"""
        MERGE INTO {target} t
        USING {source_view} s
        ON {on}
        WHEN MATCHED AND s.op = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *
    """


def iceberg_available(spark) -> bool:
    """True when an Iceberg SQL extension/catalog is configured."""
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    return "IcebergSparkSessionExtensions" in ext


def merge_apply_iceberg(
    spark, target_table: str, batch_df: DataFrame, key_cols: list[str]
) -> None:
    """Production path: LWW-dedup then a single atomic MERGE INTO.

    Iceberg gives snapshot-atomic commit, bucket(N, conv_id) partition
    pruning and schema merge (``write.spark.accept-any-schema`` +
    ``mergeSchema``) natively; the SnapshotTable path above mirrors
    those semantics 1:1 so tests here certify the same behavior.
    """
    deduped = lww_dedup(batch_df, key_cols)
    view = "cdc_batch_src"
    deduped.createOrReplaceTempView(view)
    spark.sql(iceberg_merge_sql(target_table, view, key_cols))
