"""Watermarked event-time windowed aggregation over the change tail.

The reference never needs late-data handling (its batch boundaries
never split a timestamp and the savepoint only advances past durable
writes — SURVEY.md §2.9 T7), but a distributed tail delivers late and
out-of-order events as a matter of course.  This is the standard
Structured Streaming answer: event-time tumbling/sliding windows with
a watermark bound on lateness — used for the engine's ingest metrics
(events/ops per window) without a second bookkeeping pass.

Contract: an event later than ``watermark`` relative to the max
observed op_ts is dropped from closed windows; anything within the
bound is counted exactly once (append mode emits a window only after
the watermark passes its end, so downstream sees each window once,
final).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_ingest_metrics(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "op_ts",
) -> DataFrame:
    """Streaming (or batch) per-window ingest counters.

    Returns ``(window_start, window_end, n_events, n_convs, n_deletes,
    max_lsn)`` — the lineage-style metrics, windowed by event time.
    Works on a batch DataFrame too (watermark is a no-op there).
    """
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("conv_id").alias("n_convs"),
            F.sum((F.col("op") == "D").cast("long")).alias("n_deletes"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "n_convs",
            "n_deletes",
            "max_lsn",
        )
    )
