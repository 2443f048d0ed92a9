"""Footer-stats window planning (sources/file_stats.py): capped
incremental windows bounded from parquet footers with ZERO data scans
on a time-contiguous (log-shipped) tail, quantile-probe fallback on
overlapping files — the scale successor to runner._bound_window's
per-window count + approxQuantile over the whole pending tail."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from cwds_jobs_spark import state as st
from cwds_jobs_spark.oracle import assert_matches, replay
from cwds_jobs_spark.runner import CdcJobRunner, JobConfig
from cwds_jobs_spark.sources.file_stats import (
    FileStat,
    collect_file_stats,
    plan_window_boundaries,
)
from cwds_jobs_spark.synth import synth_changes

T0 = dt.datetime(2021, 3, 1)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def _write_contiguous_tail(
    spark, changes_dir, n_dirs, per_dir, start_lsn=0, prefix="chunk"
):
    """Sequential time-contiguous chunk files — the CDC log-shipping
    layout (each shipped file covers a disjoint op_ts range)."""
    all_ev = synth_changes(
        spark, n_dirs * per_dir, n_convs=20, start_lsn=start_lsn
    ).orderBy("op_ts", "lsn")
    rows = all_ev.collect()
    for d in range(n_dirs):
        chunk = rows[d * per_dir : (d + 1) * per_dir]
        spark.createDataFrame(chunk, all_ev.schema).coalesce(1).write.parquet(
            f"{changes_dir}/{prefix}{d:03d}"
        )
    return rows


class TestCollect:
    def test_footer_stats_match_data(self, spark, ws):
        rows = _write_contiguous_tail(spark, ws["changes"], 3, 40)
        stats = collect_file_stats(spark, ws["changes"])
        assert len(stats) == 3
        assert sum(s.rows for s in stats) == 120
        # every file's min/max present (TIMESTAMP_MICROS carries stats)
        # and globally consistent with the data
        assert all(s.min_ts is not None and s.max_ts is not None for s in stats)
        lo = min(s.min_ts for s in stats)
        hi = max(s.max_ts for s in stats)
        assert lo == min(r.op_ts for r in rows)
        assert hi == max(r.op_ts for r in rows)

    def test_empty_dir(self, spark, ws):
        assert collect_file_stats(spark, ws["changes"]) == []


class TestPlan:
    def _stat(self, i, rows, lo, hi):
        return FileStat(f"f{i}", rows, _ts(lo), _ts(hi))

    def test_contiguous_files_cut_near_cap(self):
        stats = [self._stat(i, 50, i * 10, i * 10 + 9) for i in range(10)]
        bs = plan_window_boundaries(stats, None, cap=100)
        assert bs == [_ts(19), _ts(39), _ts(59), _ts(79), _ts(99)]

    def test_after_ts_skips_applied_files(self):
        stats = [self._stat(i, 50, i * 10, i * 10 + 9) for i in range(10)]
        bs = plan_window_boundaries(stats, _ts(49), cap=100)
        # files 0-3 fully applied (max_ts < 49... file 4 has max 49 ==
        # after_ts: stays live for equal-ts lsn tiebreaks but emits no
        # boundary <= after_ts)
        assert bs is not None and all(b > _ts(49) for b in bs)
        assert bs[-1] == _ts(99)

    def test_overlapping_files_fall_back(self):
        # unsorted bulk write: every file spans the full range
        stats = [self._stat(i, 100, 0, 99) for i in range(5)]
        assert plan_window_boundaries(stats, None, cap=50) is None

    def test_missing_stats_fall_back(self):
        stats = [self._stat(0, 50, 0, 9), FileStat("f1", 50, None, None)]
        assert plan_window_boundaries(stats, None, cap=30) is None

    def test_no_live_files(self):
        stats = [self._stat(0, 50, 0, 9)]
        assert plan_window_boundaries(stats, _ts(100), cap=10) == []

    def test_straddling_file_prorated_not_full_count(self):
        """A mostly-applied file straddling the savepoint contributes
        ~its pending fraction, not its full row count (r3 advisory:
        full-count tripped the worst>4*cap fallback on resume-heavy
        tails — exactly where the fast path matters most)."""
        stats = [FileStat("f0", 1000, _ts(0), _ts(999))]
        # savepoint at t=899: ~100 of 1000 rows pending.  Full-count
        # would read worst=1000 > 4*150 and bail to the quantile probe.
        bs = plan_window_boundaries(stats, _ts(899), cap=150)
        assert bs == [_ts(999)]

    def test_straddler_raw_bound_guards_clustered_rows(self):
        """Round-4 advisory: pro-rating assumes uniform row-time
        density.  A straddling unit with a tiny pending TIME fraction
        but a huge raw count could physically land all its rows in the
        first window (rows clustered near max_ts) — the estimate can be
        arbitrarily low while the window holds the whole unit.  When
        the raw un-prorated bound blows far past the cap, bail to the
        quantile probe instead of promising a bounded window."""
        # savepoint at t=990 of [0,999]: estimate ~90 rows (passes the
        # 4x estimate gate) but the window's raw bound is 10k rows,
        # ~66x the cap
        stats = [FileStat("f0", 10_000, _ts(0), _ts(999))]
        assert plan_window_boundaries(stats, _ts(990), cap=150) is None

    def test_straddler_raw_bound_moderate_keeps_fast_path(self):
        # raw bound within 8x cap: the zero-scan fast path survives
        # (the common resume shape — last shipped chunk half-applied)
        stats = [FileStat("f0", 1000, _ts(0), _ts(999))]
        assert plan_window_boundaries(stats, _ts(899), cap=150) == [_ts(999)]

    def test_fully_applied_boundary_file_excluded(self):
        """max_ts == after_ts means every row is <= the savepoint ts —
        nothing pending in this unit (equal-ts lsn stragglers are the
        final uncapped pass's job); it must not inflate the first
        window's estimate."""
        stats = [
            FileStat("f0", 10_000, _ts(0), _ts(49)),
            FileStat("f1", 100, _ts(50), _ts(99)),
        ]
        bs = plan_window_boundaries(stats, _ts(49), cap=150)
        # old behavior: f0's 10k rows counted -> worst > 4*cap -> None
        assert bs == [_ts(99)]

    def test_row_group_units_plan_overlapping_files(self):
        """Parallel bulk write: every FILE spans the whole range (file-
        granular boundaries collapse into one giant window) but each
        file's ROW GROUPS are narrow — planning from row-group stats
        keeps the zero-scan fast path alive."""
        rgs = [(100, _ts(q * 25), _ts(q * 25 + 24)) for q in range(4)]
        stats = [
            FileStat("f0", 400, _ts(0), _ts(99), row_groups=rgs),
            FileStat("f1", 400, _ts(0), _ts(99), row_groups=rgs),
        ]
        bs = plan_window_boundaries(stats, None, cap=150)
        assert bs == [_ts(24), _ts(49), _ts(74), _ts(99)]
        # the same layout WITHOUT row-group stats must still bail out
        flat = [FileStat("f0", 400, _ts(0), _ts(99)),
                FileStat("f1", 400, _ts(0), _ts(99))]
        assert plan_window_boundaries(flat, None, cap=150) is None


class TestRunnerIntegration:
    def _runner(self, spark, ws, **kw):
        return CdcJobRunner(
            spark,
            JobConfig(
                job_id="fsjob",
                changes_dir=ws["changes"],
                table_path=ws["table"],
                state_dir=ws["state"],
                lineage_dir=ws["lineage"],
                num_buckets=8,
                **kw,
            ),
        )

    def test_capped_drain_plans_from_footers_no_tail_scans(
        self, spark, ws, monkeypatch
    ):
        """Multi-window capped replay over a log-shipped tail must never
        invoke the quantile probe (the per-window full-tail scan)."""
        rows = _write_contiguous_tail(spark, ws["changes"], 1, 50)
        r = self._runner(spark, ws, max_events_per_window=100)
        r.run()  # initial load on chunk000 + cutover

        more = _write_contiguous_tail(
            spark, ws["changes"], 9, 50, start_lsn=50, prefix="t2_chunk"
        )

        def boom(self_, pending, cap):
            raise AssertionError("quantile probe ran — footer plan unused")

        monkeypatch.setattr(CdcJobRunner, "_bound_window", boom)
        out = r.run()
        assert out["events"] == 450
        # ~100-event windows over 450 pending rows: 5 planned windows
        assert out["windows"] == 5
        expected = replay(
            [e for e in rows if e.op != "D"] + list(more)
        )
        assert_matches(r.table().read(), expected)
        hi = max(more, key=lambda e: (e.op_ts, e.lsn))
        assert r.sp_svc.read().savepoint.as_tuple() == (hi.op_ts, hi.lsn)

    def test_overlapping_bulk_tail_planned_from_row_groups(
        self, spark, ws, monkeypatch
    ):
        """Parallel-bulk-write layout: each tail file spans the whole
        op_ts range (file-granular planning collapses) but row groups
        inside each file are narrow — the drain must still plan every
        window from FOOTERS, never the quantile probe."""
        rows0 = _write_contiguous_tail(spark, ws["changes"], 1, 50)
        r = self._runner(spark, ws, max_events_per_window=150)
        r.run()  # initial + cutover

        # 900 later events dealt round-robin into 3 files: each file is
        # internally time-sorted and spans the full range; a tiny
        # parquet block size forces multiple narrow row groups per file
        bulk = synth_changes(spark, 900, n_convs=20, start_lsn=50)
        for i in range(3):
            (
                bulk.filter(F.col("lsn") % 3 == i)
                .coalesce(1)
                .sortWithinPartitions("op_ts", "lsn")
                .write.option("parquet.block.size", 4096)
                .parquet(f"{ws['changes']}/bulk{i}")
            )
        stats = collect_file_stats(spark, ws["changes"])
        bulk_stats = [
            s for s in stats
            if os.path.basename(os.path.dirname(s.path)).startswith("bulk")
        ]
        assert len(bulk_stats) == 3
        assert all(
            s.row_groups is not None and len(s.row_groups) > 1
            for s in bulk_stats
        ), [len(s.row_groups or []) for s in bulk_stats]

        def boom(self_, pending, cap):
            raise AssertionError("quantile probe ran — row-group plan unused")

        monkeypatch.setattr(CdcJobRunner, "_bound_window", boom)
        out = r.run()
        assert out["events"] == 900 and out["windows"] >= 3
        expected = replay(
            [e for e in rows0 if e.op != "D"] + list(bulk.collect())
        )
        assert_matches(r.table().read(), expected)

    def test_overlapping_tail_still_converges_via_probe(self, spark, ws):
        """Unsorted bulk tail → planner returns None → quantile-probe
        fallback still drains correctly (pre-existing behavior)."""
        ev = synth_changes(spark, 300, n_convs=8, ts_group=10)
        ev.filter("lsn < 50").write.parquet(ws["changes"] + "/w0")
        r = self._runner(spark, ws, max_events_per_window=40)
        r.run()
        ev.filter("lsn >= 50").write.parquet(ws["changes"] + "/w1")
        out = r.run()
        assert out["events"] == 250 and out["windows"] >= 2
        expected = replay(
            [e for e in ev.collect() if e.lsn < 50 and e.op != "D"]
            + [e for e in ev.collect() if e.lsn >= 50]
        )
        assert_matches(r.table().read(), expected)


def test_changes_files_carry_op_ts_stats(spark, ws):
    """Regression pin for the INT96 trap: parquet written by this
    engine's session must carry op_ts min/max footer statistics (INT96,
    the legacy spark default, has none — which also silently disables
    row-group pruning for the savepoint predicate)."""
    synth_changes(spark, 100, n_convs=5).write.parquet(ws["changes"] + "/w0")
    stats = collect_file_stats(spark, ws["changes"])
    assert stats and all(
        s.min_ts is not None and s.max_ts is not None for s in stats
    )
