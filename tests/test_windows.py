"""Watermarked windowed ingest metrics: late-within-bound counted,
late-beyond-bound dropped (SURVEY.md §2.9 T7's Spark-side contract)."""

from __future__ import annotations

import datetime as dt
import os

from cwds_jobs_spark.schema import CHANGES_SCHEMA
from cwds_jobs_spark.streaming.windows import windowed_ingest_metrics

T0 = dt.datetime(2022, 1, 1)


def _ev(conv, minutes, lsn, op="I"):
    t = T0 + dt.timedelta(minutes=minutes)
    return (conv, 0, op, t, lsn, "user", "x", None, t)


def _write(spark, rows, path):
    spark.createDataFrame(rows, CHANGES_SCHEMA).coalesce(1).write.parquet(path)


def test_streaming_late_data_contract(spark, ws):
    src = ws["changes"]

    emitted = {}

    def drain(name):
        events = (
            spark.readStream.schema(CHANGES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

        def sink(batch_df, _epoch):
            for r in batch_df.collect():
                emitted[r.window_start] = r

        q = (
            windowed_ingest_metrics(
                events, window="1 hour", watermark="30 minutes"
            )
            .writeStream.foreachBatch(sink)
            .queryName(name)
            .option("checkpointLocation", ws["checkpoint"])
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _write(spark, [_ev("a", 10, 0), _ev("a", 20, 1), _ev("b", 70, 2)],
           os.path.join(src, "f1"))
    # in-bound late event (00:40, window 0 still open) + watermark mover
    _write(spark, [_ev("c", 40, 3), _ev("c", 180, 4)], os.path.join(src, "f2"))
    drain("win_p1")  # checkpoint persists watermark = 03:00-30m = 02:30
    # beyond-bound late event (00:50, watermark already 02:30) + tail
    _write(spark, [_ev("d", 50, 5, "D"), _ev("d", 190, 6)],
           os.path.join(src, "f3"))
    drain("win_p2")  # resume from checkpoint; late row must be dropped
    rows = emitted
    w0 = rows[T0]
    # events at 00:10, 00:20 plus the IN-BOUND late 00:40; the
    # BEYOND-BOUND 00:50 delete was dropped
    assert w0.n_events == 3 and w0.n_deletes == 0 and w0.max_lsn == 3
    w1 = rows[T0 + dt.timedelta(hours=1)]
    assert w1.n_events == 1 and w1.max_lsn == 2
    # the 03:00+ window never closed (no later watermark) -> not emitted
    assert len(rows) == 2


def test_batch_mode_same_query(spark):
    rows = [_ev("a", 10, 0), _ev("a", 20, 1), _ev("b", 70, 2), _ev("x", 40, 3, "D")]
    df = spark.createDataFrame(rows, CHANGES_SCHEMA)
    out = {r.window_start: r for r in windowed_ingest_metrics(df).collect()}
    assert out[T0].n_events == 3 and out[T0].n_deletes == 1
    assert out[T0 + dt.timedelta(hours=1)].n_events == 1
