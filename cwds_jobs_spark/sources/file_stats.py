"""Parquet-footer window planning: bound incremental windows from
per-file row counts + op_ts min/max statistics — ZERO data scans.

The capped incremental loop needs a per-window timestamp boundary such
that each window holds ~``cap`` events.  Probing it from the data
(count + approxQuantile over the un-applied tail, ``runner.
CdcJobRunner._bound_window``) re-scans the tail's op_ts column once
per window — O(windows × tail) at 10^10 scale.  Parquet footers
already carry exact per-file row counts and per-row-group min/max for
op_ts (written as INT64 TIMESTAMP_MICROS — see ``session.py``; the
legacy INT96 encoding has no statistics), so ALL window boundaries for
a drain can be planned up front from O(files) footer reads, none of
which touch data pages.

This is the scale analog of the reference's k-th-row boundary probes
(jobs-common CwsChangedIdentifierDao.java:45-60): windows cut at op_ts
boundaries, equal-timestamp event groups never split, the cap is an
approximate memory bound (correctness never depends on the cut —
apply is idempotent LWW).
"""

from __future__ import annotations

import datetime as dt
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

# distribute footer reads once the listing is bigger than a driver
# can chew through serially in ~100ms
_DRIVER_SIDE_MAX_FILES = 64


@dataclass
class FileStat:
    path: str
    rows: int
    min_ts: dt.datetime | None  # None = no usable statistics
    max_ts: dt.datetime | None
    # per-ROW-GROUP (rows, min_ts, max_ts) — the finer planning unit.
    # Files of a parallel bulk write often overlap each other in time
    # while each file's row groups stay narrow; planning from row
    # groups keeps the footer fast path alive for that layout
    # (reference O2/O3 probe semantics, CwsChangedIdentifierDao.java:
    # 45-60).  None = not collected (hand-built stats in tests).
    row_groups: "list[tuple[int, dt.datetime, dt.datetime]] | None" = None


def list_parquet_files(changes_dir: str) -> list[str]:
    out: list[str] = []
    for root, _dirs, files in os.walk(changes_dir):
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.append(os.path.join(root, f))
    return sorted(out)


def _to_naive_utc(v) -> dt.datetime | None:
    if v is None:
        return None
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v
    return None


def _stats_for_paths(paths, ts_col: str) -> list[tuple]:
    """Footer-only reads: (path, rows, min_ts, max_ts, row_groups) per
    file; min/max (and row_groups) are None when any row group lacks
    usable statistics."""
    import pyarrow.parquet as pq

    out = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        idx = None
        if md.num_row_groups:
            rg0 = md.row_group(0)
            for i in range(rg0.num_columns):
                if rg0.column(i).path_in_schema == ts_col:
                    idx = i
                    break
        rgs: list | None = [] if idx is not None else None
        if idx is not None:
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                st = rg.column(idx).statistics
                if st is None or not st.has_min_max:
                    rgs = None
                    break
                lo, hi = _to_naive_utc(st.min), _to_naive_utc(st.max)
                if lo is None or hi is None:
                    rgs = None
                    break
                rgs.append((rg.num_rows, lo, hi))
        if rgs:
            mn = min(r[1] for r in rgs)
            mx = max(r[2] for r in rgs)
        else:
            mn = mx = rgs = None
        out.append((p, md.num_rows, mn, mx, rgs))
    return out


def collect_file_stats(
    spark: SparkSession, changes_dir: str, ts_col: str = "op_ts"
) -> list[FileStat]:
    """Per-file (rows, min/max op_ts) from parquet footers.

    Small listings read footers driver-side; larger ones fan the paths
    out as a tiny Spark job (mapInPandas over path strings) so footer
    I/O parallelizes across executors — still zero data-page reads.
    """
    files = list_parquet_files(changes_dir)
    if not files:
        return []
    if len(files) <= _DRIVER_SIDE_MAX_FILES:
        rows = _stats_for_paths(files, ts_col)
    else:
        import json

        import pandas as pd

        def _rg_json(rgs) -> str | None:
            if rgs is None:
                return None
            return json.dumps(
                [[n, lo.isoformat(), hi.isoformat()] for n, lo, hi in rgs]
            )

        def read_footers(parts):
            for pdf in parts:
                if pdf.empty:
                    continue
                r = _stats_for_paths(pdf["path"].tolist(), ts_col)
                yield pd.DataFrame(
                    [(p, n, mn, mx, _rg_json(rgs)) for p, n, mn, mx, rgs in r],
                    columns=["path", "rows", "min_ts", "max_ts", "rgs"],
                )

        pdf = (
            spark.createDataFrame([(p,) for p in files], "path string")
            .repartition(min(len(files) // 8 + 1, 256))
            .mapInPandas(
                read_footers,
                schema="path string, rows long, min_ts timestamp,"
                " max_ts timestamp, rgs string",
            )
            .toPandas()
        )
        rows = [
            (
                r.path,
                int(r.rows),
                _to_naive_utc(None if pd.isna(r.min_ts) else r.min_ts.to_pydatetime()),
                _to_naive_utc(None if pd.isna(r.max_ts) else r.max_ts.to_pydatetime()),
                None
                if r.rgs is None
                else [
                    (int(n), dt.datetime.fromisoformat(lo), dt.datetime.fromisoformat(hi))
                    for n, lo, hi in json.loads(r.rgs)
                ],
            )
            for r in pdf.itertuples()
        ]
    return [FileStat(p, n, mn, mx, rgs) for (p, n, mn, mx, rgs) in rows]


def plan_window_boundaries(
    stats: list[FileStat],
    after_ts: dt.datetime | None,
    cap: int,
) -> list[dt.datetime] | None:
    """Timestamp boundaries cutting the un-applied tail into ~``cap``-row
    windows, derived purely from footer stats.

    The planning unit is the parquet ROW GROUP when per-row-group stats
    were collected, else the file: a parallel bulk write produces files
    that each span the whole time range (file-granular boundaries would
    collapse into one giant window) while each file's row groups stay
    narrow, so row-group units keep the zero-scan fast path alive for
    that layout.

    Returns None when footer stats cannot bound windows near the cap —
    a file lacks op_ts statistics, the units THEMSELVES overlap so
    much that a window exceeds 4× the cap on estimated rows (a
    genuinely shuffled bulk write, where every row group also spans
    the range), or a window's RAW un-prorated row bound exceeds 8× the
    cap (a savepoint-straddling unit whose rows cluster near its
    max_ts defeats the uniform-density pro-rating — the estimate can
    be arbitrarily low while the window physically holds the whole
    unit).  The caller then falls back to the data-scan quantile
    probe.  Returns [] when
    no unit can hold events after ``after_ts``.  Boundaries are
    strictly increasing; the last is the tail's global max op_ts, so
    the final window drains everything planned.

    Savepoint handling: units with ``max_ts <= after_ts`` are fully
    applied and excluded (equal-ts higher-lsn stragglers are drained by
    the caller's final uncapped pass); a unit STRADDLING the savepoint
    contributes its row count pro-rated by the fraction of its
    [min_ts, max_ts] span above ``after_ts`` — counting its full rows
    oversized the first resume window by the already-applied remainder
    (the bound is approximate either way; correctness never depends on
    the cut because apply is idempotent LWW).
    """
    if any(s.min_ts is None or s.max_ts is None for s in stats):
        return None
    # flatten to planning units:
    # (estimated pending rows, RAW rows, min_ts, max_ts) — the estimate
    # pro-rates a savepoint-straddling unit by time fraction; the raw
    # count is its un-prorated upper bound (the window can never hold
    # more rows than the units it covers physically contain)
    units: list[tuple[float, int, dt.datetime, dt.datetime]] = []
    for s in stats:
        for rows, lo, hi in s.row_groups or [(s.rows, s.min_ts, s.max_ts)]:
            if after_ts is not None and hi <= after_ts:
                continue  # fully applied
            est: float = rows
            if after_ts is not None and lo < after_ts:
                span = (hi - lo).total_seconds()
                if span > 0:
                    frac = (hi - after_ts).total_seconds() / span
                    est = max(1.0, rows * frac)
            units.append((est, rows, lo, hi))
    if not units:
        return []
    # sweep candidate boundaries (unit max_ts ascending); a boundary b
    # closes a window holding every not-yet-assigned row of units with
    # max_ts <= b
    units.sort(key=lambda u: u[3])
    boundaries: list[dt.datetime] = []
    acc = 0.0
    acc_raw = 0
    worst = 0.0
    worst_raw = 0
    for i, (rows, raw, _lo, hi) in enumerate(units):
        acc += rows
        acc_raw += raw
        is_last = i == len(units) - 1
        next_differs = is_last or units[i + 1][3] > hi
        if (acc >= cap and next_differs) or is_last:
            boundaries.append(hi)
            worst = max(worst, acc)
            worst_raw = max(worst_raw, acc_raw)
            acc = 0.0
            acc_raw = 0
    if worst > 4 * cap:
        return None  # overlapping units: boundaries collapsed
    if worst_raw > 8 * cap:
        # pro-rated estimates assume uniform row-time density; a
        # straddling unit whose rows cluster near max_ts can be
        # underestimated arbitrarily, letting a "~cap" window
        # physically hold up to its raw-count bound.  When that bound
        # blows far past the cap, the memory guarantee the cap exists
        # for is gone — fall back to the data-scan quantile probe
        # (a one-drain cost, only on resumes over huge straddlers).
        return None
    # dedupe while preserving order (equal max_ts units collapse)
    seen: set = set()
    out = []
    for b in boundaries:
        if b not in seen:
            seen.add(b)
            out.append(b)
    return out
