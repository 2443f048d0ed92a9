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
    """Footer-only reads: (path, rows, min_ts, max_ts) per file;
    min/max are None when any row group lacks usable statistics."""
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
        mn = mx = None
        if idx is not None:
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                if st is None or not st.has_min_max:
                    mn = mx = None
                    break
                lo, hi = _to_naive_utc(st.min), _to_naive_utc(st.max)
                if lo is None or hi is None:
                    mn = mx = None
                    break
                mn = lo if mn is None else min(mn, lo)
                mx = hi if mx is None else max(mx, hi)
        out.append((p, md.num_rows, mn, mx))
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
        import pandas as pd

        def read_footers(parts):
            for pdf in parts:
                if pdf.empty:
                    continue
                r = _stats_for_paths(pdf["path"].tolist(), ts_col)
                yield pd.DataFrame(
                    r, columns=["path", "rows", "min_ts", "max_ts"]
                )

        pdf = (
            spark.createDataFrame([(p,) for p in files], "path string")
            .repartition(min(len(files) // 8 + 1, 256))
            .mapInPandas(
                read_footers,
                schema="path string, rows long, min_ts timestamp, max_ts timestamp",
            )
            .toPandas()
        )
        rows = [
            (
                r.path,
                int(r.rows),
                _to_naive_utc(None if pd.isna(r.min_ts) else r.min_ts.to_pydatetime()),
                _to_naive_utc(None if pd.isna(r.max_ts) else r.max_ts.to_pydatetime()),
            )
            for r in pdf.itertuples()
        ]
    return [FileStat(p, n, mn, mx) for (p, n, mn, mx) in rows]


def plan_window_boundaries(
    stats: list[FileStat],
    after_ts: dt.datetime | None,
    cap: int,
) -> list[dt.datetime] | None:
    """Timestamp boundaries cutting the un-applied tail into ~``cap``-row
    windows, derived purely from footer stats.

    Returns None when footer stats cannot bound windows near the cap —
    a file lacks op_ts statistics, or the tail's files OVERLAP in time
    (every file of an unsorted bulk write spans the whole range, so
    file-granular boundaries would collapse into one giant window; a
    log-shipped tail of time-contiguous chunks is the layout this fast
    path serves).  The caller then falls back to the data-scan
    quantile probe.  Returns [] when no file can hold events after
    ``after_ts``.  Boundaries are strictly increasing; the last is the
    tail's global max op_ts, so the final window drains everything
    planned.  Files straddling a boundary or the savepoint contribute
    their full row count when their file completes (the cap is an
    approximate bound, not exact).
    """
    live = [s for s in stats if s.max_ts is None or after_ts is None or s.max_ts >= after_ts]
    if any(s.min_ts is None or s.max_ts is None for s in live):
        return None
    if not live:
        return []
    # sweep candidate boundaries (file max_ts ascending); a boundary b
    # closes a window holding every not-yet-assigned row of files with
    # max_ts <= b
    live.sort(key=lambda s: s.max_ts)
    boundaries: list[dt.datetime] = []
    acc = 0
    worst = 0
    for i, s in enumerate(live):
        acc += s.rows
        is_last = i == len(live) - 1
        next_differs = is_last or live[i + 1].max_ts > s.max_ts
        if (acc >= cap and next_differs) or is_last:
            if after_ts is None or s.max_ts > after_ts:
                boundaries.append(s.max_ts)
                worst = max(worst, acc)
                acc = 0
    if worst > 4 * cap:
        return None  # overlapping files: boundaries collapsed
    # dedupe while preserving order (equal max_ts files collapse)
    seen: set = set()
    out = []
    for b in boundaries:
        if b not in seen:
            seen.add(b)
            out.append(b)
    return out
