"""Table maintenance: small-file compaction.

Every MERGE commit rewrites its affected buckets into a fresh commit
directory, so a bucket's *current* file group is always one commit's
worth — but a long-running tail accumulates many small parquet files
inside a file group when the writing stage had many tasks.  At 10^10
rows small files dominate scan cost (file-open overhead, no row-group
pruning leverage), so periodic compaction is a first-class maintenance
op — the SnapshotTable analog of Iceberg's ``rewrite_data_files``.

The reference has no analog (Elasticsearch does its own segment
merging); this is Spark/lakehouse-specific operational surface.
"""

from __future__ import annotations

import os

from cwds_jobs_spark.table.snapshot import SnapshotTable


def bucket_file_counts(table: SnapshotTable) -> dict[int, int]:
    return {
        int(b): len(e["files"]) for b, e in table._snap["buckets"].items()
    }


def compact_buckets(
    table: SnapshotTable,
    *,
    max_files_per_bucket: int = 4,
    buckets: list[int] | None = None,
) -> int:
    """Rewrite buckets holding more than ``max_files_per_bucket`` files
    into a single file group each (one file per bucket via a
    bucket-local coalesce).  Atomic snapshot swap like any commit;
    readers never see a half-compacted table.  Returns the number of
    buckets rewritten.
    """
    counts = bucket_file_counts(table)
    todo = sorted(
        b
        for b, n in counts.items()
        if n > max_files_per_bucket and (buckets is None or b in buckets)
    )
    if not todo:
        return 0
    df = table.read(todo, include_internal=True)
    # overwrite_buckets clusters by bucket id -> one file per bucket
    table.overwrite_buckets(df, todo)
    return len(todo)


def table_file_stats(table: SnapshotTable) -> dict:
    """Operational metrics: files, bytes, buckets — lineage-table feed."""
    counts = bucket_file_counts(table)
    total_bytes = 0
    for e in table._snap["buckets"].values():
        for f in e["files"]:
            p = os.path.join(table.path, f)
            if os.path.exists(p):
                total_bytes += os.path.getsize(p)
    return {
        "buckets": len(counts),
        "files": sum(counts.values()),
        "max_files_in_bucket": max(counts.values(), default=0),
        "bytes": total_bytes,
    }
