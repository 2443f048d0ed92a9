"""Per-partition lineage / metrics table (SURVEY.md §2.11 C4, §2.1 S13).

Reference analogs: the written-entities counter (jobs-common/.../util/
ConsumerCounter.java:5-27), the audit job's bulk "mark processed"
finalizer (jobs-audit-events/.../NsAuditEventDao.java:114-118), and the
wall-clock / ETA reporting (jobs-common/.../timereport/*).

Each micro-batch appends one row per input partition:
``(job_id, batch_id, partition_id, events_applied, max_lsn,
watermark_ts)``.  Rows for a batch are written under a
``job=<id>/batch=<n>`` directory with ``mode=overwrite``, so a replayed
at-least-once delivery simply rewrites the same path — lineage is
idempotent, never double-counted (FIXTURES.md §2 "replayed batch").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cwds_jobs_spark.schema import LINEAGE_SCHEMA


def batch_lineage(batch_df: DataFrame, job_id: str, batch_id: int) -> DataFrame:
    """Per-input-partition metrics for one change window."""
    return (
        batch_df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("events_applied"),
            F.max("lsn").alias("max_lsn"),
            F.max("op_ts").alias("watermark_ts"),
        )
        .select(
            F.lit(job_id).alias("job_id"),
            F.lit(batch_id).cast("long").alias("batch_id"),
            F.col("partition_id"),
            F.col("events_applied"),
            F.col("max_lsn"),
            F.col("watermark_ts"),
        )
    )


def write_lineage(
    batch_df: DataFrame, lineage_dir: str, job_id: str, batch_id: int
) -> dict:
    """Write lineage rows for a batch; returns aggregate stats.

    Overwrites the batch's own directory only — idempotent under
    micro-batch replay.
    """
    lin = batch_lineage(batch_df, job_id, batch_id)
    path = os.path.join(lineage_dir, f"job={job_id}", f"batch={batch_id}")
    lin.write.mode("overwrite").parquet(path)
    rows = (
        lin.agg(
            F.sum("events_applied").alias("events"),
            F.max("max_lsn").alias("max_lsn"),
            F.max("watermark_ts").alias("watermark_ts"),
        ).collect()
    )[0]
    return {
        "events": int(rows["events"] or 0),
        "max_lsn": None if rows["max_lsn"] is None else int(rows["max_lsn"]),
        "watermark_ts": rows["watermark_ts"],
    }


def read_lineage(spark: SparkSession, lineage_dir: str) -> DataFrame:
    if not os.path.exists(lineage_dir):
        return spark.createDataFrame([], LINEAGE_SCHEMA)
    return (
        spark.read.option("recursiveFileLookup", "true")
        .schema(LINEAGE_SCHEMA)
        .parquet(lineage_dir)
    )
