"""Stateful streaming sessionization (applyInPandasWithState):
in-batch gap splits, event-time timeout closes, late-data contract.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from cwds_jobs_spark.schema import CHANGES_SCHEMA
from cwds_jobs_spark.streaming.sessionize import sessionize_batch, sessionize_stream

T0 = dt.datetime(2022, 1, 1)


def _ev(conv, turn, minutes, lsn):
    t = T0 + dt.timedelta(minutes=minutes)
    return (conv, turn, "I", t, lsn, "user", f"{conv}@{minutes}", None, t)


def _write(spark, rows, path):
    spark.createDataFrame(rows, CHANGES_SCHEMA).coalesce(1).write.parquet(path)


def test_streaming_sessions_close_by_gap_and_timeout(spark, ws, tmp_path):
    src = ws["changes"]
    # f1: conv A has two activity bursts (in-batch gap split), conv B one
    _write(spark, [
        _ev("A", 0, 0, 0), _ev("A", 1, 1, 1), _ev("A", 2, 120, 2),
        _ev("B", 0, 0, 3), _ev("B", 1, 1, 4), _ev("B", 2, 2, 5),
    ], os.path.join(src, "f1"))
    # f2 advances the watermark far past A/B; f3 triggers their timeouts
    _write(spark, [_ev("C", 0, 300, 6)], os.path.join(src, "f2"))
    _write(spark, [_ev("D", 0, 301, 7)], os.path.join(src, "f3"))

    events = (
        spark.readStream.schema(CHANGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    sessions = sessionize_stream(
        events, gap=dt.timedelta(minutes=30), watermark="10 minutes"
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", ws["checkpoint"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.conv_id, r.session_start.minute + 60 * r.session_start.hour): r
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # A burst 1 (t=0..1) closed in-batch by the gap split
    a1 = got[("A", 0)]
    assert a1.closed_by == "gap" and a1.n_events == 2 and a1.n_turns == 2
    # B (t=0..2) closed by event-time timeout once the watermark passed
    b = got[("B", 0)]
    assert b.closed_by == "timeout" and b.n_events == 3 and b.n_turns == 3
    # A burst 2 (t=120min -> 2:00) closed by timeout after f2's
    # watermark advance; key is minute-of-day
    a2 = got[("A", 120)]
    assert a2.closed_by == "timeout" and a2.n_events == 1
    # C and D sessions are still open (watermark never passed them)
    assert not any(c == "C" or c == "D" for c, _ in got)
    assert len(got) == 3


def test_batch_oracle_agrees_on_closed_sessions(spark, ws):
    rows = [
        _ev("A", 0, 0, 0), _ev("A", 1, 1, 1), _ev("A", 2, 120, 2),
        _ev("B", 0, 0, 3), _ev("B", 1, 1, 4), _ev("B", 2, 2, 5),
        _ev("C", 0, 300, 6), _ev("D", 0, 301, 7),
    ]
    df = spark.createDataFrame(rows, CHANGES_SCHEMA)
    out = {
        (r.conv_id, r.session_start, r.session_end): (r.n_events, r.n_turns)
        for r in sessionize_batch(df, gap=dt.timedelta(minutes=30)).collect()
    }
    assert out[("A", T0, T0 + dt.timedelta(minutes=1))] == (2, 2)
    assert out[("A", T0 + dt.timedelta(minutes=120),
                T0 + dt.timedelta(minutes=120))] == (1, 3)
    assert out[("B", T0, T0 + dt.timedelta(minutes=2))] == (3, 3)
    assert len(out) == 5  # incl. open-ended C and D singletons


def test_batch_oracle_splits_at_subsecond_gap(spark):
    """sessionize_batch must compare gaps in MILLISECONDS like the
    streaming path (_session_fn): unix_timestamp() truncates to whole
    seconds, so a 1050ms gap against a 1000ms threshold read as 1s ≤ 1s
    and merged — disagreeing with the stream and breaking the
    `drain ∪ open_sessions` union contract."""
    t = lambda ms: T0 + dt.timedelta(milliseconds=ms)
    rows = [
        ("A", 0, "I", t(0), 0, "user", "x", None, t(0)),
        ("A", 1, "I", t(900), 1, "user", "y", None, t(900)),
        # 1050ms after the previous event: > 1s gap, must split (the
        # truncated-seconds diff is exactly 1, which would merge)
        ("A", 2, "I", t(1950), 2, "user", "z", None, t(1950)),
    ]
    df = spark.createDataFrame(rows, CHANGES_SCHEMA)
    out = sorted(
        sessionize_batch(df, gap=dt.timedelta(seconds=1)).collect(),
        key=lambda r: r.session_start,
    )
    assert len(out) == 2
    assert (out[0].session_start, out[0].session_end, out[0].n_events) == (
        t(0), t(900), 2
    )
    assert (out[1].session_start, out[1].session_end, out[1].n_events) == (
        t(1950), t(1950), 1
    )


class _FakeState:
    """Minimal GroupState stand-in for unit-testing _session_fn."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False
        self.timeout_ts = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


def _pdf(events):
    import pandas as pd

    return pd.DataFrame(
        {
            "conv_id": ["c"] * len(events),
            "op_ts": [pd.Timestamp(ms, unit="ms") for ms, _ in events],
            "turn_idx": [t for _, t in events],
        }
    )


def test_late_segment_before_open_session_closes_separately():
    """A late (but in-watermark) segment ending more than gap BEFORE
    the open session must close as its own earlier session — not be
    absorbed (round-1 bug: the merge condition only checked one end).
    """
    from cwds_jobs_spark.streaming.sessionize import _session_fn

    gap_ms = 60_000
    fn = _session_fn(gap_ms)
    # open session at [1_000_000, 1_010_000]
    st = _FakeState((1_000_000, 1_010_000, 3, 5))
    # late segment [100_000, 110_000]: ends 890s before the open start
    out = list(fn(("c",), [_pdf([(100_000, 1), (110_000, 2)])], st))
    assert len(out) == 1
    emitted = out[0]
    assert emitted["closed_by"].tolist() == ["gap"]
    assert int(emitted["session_start"][0].value // 1_000_000) == 100_000
    assert int(emitted["session_end"][0].value // 1_000_000) == 110_000
    # the open session is untouched
    assert st.get == (1_000_000, 1_010_000, 3, 5)


def test_adjacent_late_segment_still_merges():
    from cwds_jobs_spark.streaming.sessionize import _session_fn

    gap_ms = 60_000
    fn = _session_fn(gap_ms)
    st = _FakeState((1_000_000, 1_010_000, 3, 5))
    # late segment ending 30s before the open start: within gap, merge
    out = list(fn(("c",), [_pdf([(960_000, 1), (970_000, 2)])], st))
    assert out == []
    assert st.get == (960_000, 1_010_000, 5, 5)


def test_open_sessions_complements_drained_closed_set(spark, ws):
    """End-of-drain contract: the drain emits only closed sessions;
    open_sessions() returns exactly the open tail, and the union is
    the complete batch-oracle session set."""
    from cwds_jobs_spark.streaming.sessionize import open_sessions

    src = ws["changes"]
    _write(spark, [
        _ev("A", 0, 0, 0), _ev("A", 1, 1, 1),      # closes by gap below
        _ev("A", 2, 120, 2),                        # open at drain end
        _ev("B", 0, 115, 3), _ev("B", 1, 118, 4),   # open at drain end
    ], os.path.join(src, "f1"))

    events = (
        spark.readStream.schema(CHANGES_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        sessionize_stream(events, gap=dt.timedelta(minutes=30),
                          watermark="10 minutes")
        .writeStream.format("memory").queryName("sess_drain")
        .option("checkpointLocation", ws["checkpoint"])
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    closed = spark.sql("SELECT * FROM sess_drain").collect()
    # only A's first burst closed (gap split); A@120 and B still open
    assert {(r.conv_id, r.closed_by) for r in closed} == {("A", "gap")}

    batch = spark.read.schema(CHANGES_SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    still_open = open_sessions(batch, gap=dt.timedelta(minutes=30))
    got_open = {
        (r.conv_id, r.n_events, r.closed_by) for r in still_open.collect()
    }
    assert got_open == {("A", 1, "open"), ("B", 2, "open")}
    # union == complete batch session set
    from cwds_jobs_spark.streaming.sessionize import sessionize_batch

    total = sessionize_batch(batch, gap=dt.timedelta(minutes=30)).count()
    assert len(closed) + len(got_open) == total
