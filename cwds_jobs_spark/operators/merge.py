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
3. **Version-aware apply**: every stored row carries its version
   vector ``(_op_ts, _lsn)`` and a ``_deleted`` tombstone flag; the
   merge is ``union(target, winners) → max(struct(version, row))``
   per key.  This makes apply **commutative and idempotent across
   batches** — a stale event delivered late (distributed file tails
   do not guarantee LSN-ordered delivery across micro-batches) can
   never overwrite a newer row, and a tombstone blocks resurrection
   by an older insert.  The reference gets the same end state only by
   assuming strictly ordered delivery (QueryConstants.java:72-73,80 +
   sequential ElasticWriter); that assumption does not survive a
   parallel tail, so the order-dependence is engineered out here.
4. Atomically swap the affected buckets.

Exactly-once: the committed-batch ledger inside the snapshot makes a
replayed ``foreachBatch`` delivery a no-op (SURVEY.md §7.3).

Tombstones are compacted away by ``compact_tombstones`` once the tail
watermark has passed them (no event with a smaller version can still
arrive).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cwds_jobs_spark.lineage import write_lineage
from cwds_jobs_spark.operators.dedup import lww_dedup
from cwds_jobs_spark.schema import OP_DELETE
from cwds_jobs_spark.table.evolve import merge_schemas
from cwds_jobs_spark.table.snapshot import SnapshotTable, _align

VERSION_TS = "_op_ts"
VERSION_LSN = "_lsn"
TOMBSTONE = "_deleted"
_MIN_TS = dt.datetime(1970, 1, 1)


def merge_apply(
    table: SnapshotTable,
    batch_df: DataFrame,
    *,
    job_id: str,
    batch_id: int,
    lineage_dir: str | None = None,
    drop_deletes: bool = False,
    watermark: "tuple | dict | None" = None,
) -> dict:
    """Apply one change window; returns per-batch stats.

    ``drop_deletes=True`` is the initial-load mode: D events are
    filtered out entirely, matching the reference's initial queries
    (jobs-facilities-cws/.../QueryConstants.java:42,50 — ``!= 'D'``).

    ``batch_df`` MUST be deterministic across re-evaluation: the
    affected-bucket probe and the merge are two separate jobs over it
    (a file-backed or persisted frame qualifies; anything sampled or
    wall-clock-dependent does not).  A row that re-evaluates into an
    unclaimed bucket would still be committed via the per-bucket
    fallback in ``overwrite_buckets`` but bypasses bucket pruning.
    Callers on the hot path (runner, streaming driver) pass persisted
    or parquet-backed windows, so no persist is forced here.

    ``watermark`` is the window's ``(op_ts, lsn)`` high watermark; it
    is recorded atomically WITH the ledger entry.  A ledger-skipped
    replay returns it as ``committed_watermark`` so the caller can
    restore its savepoint from what was actually committed — the
    recomputed window on a crash-rerun may be a superset of the
    committed one (new tail files arrived, approxQuantile cut drift),
    and advancing the savepoint from it would skip the difference.
    A multi-source union window passes a ``{source: (op_ts, lsn)}``
    dict instead; the ledger then carries one watermark column per
    source (reference CapUsersSavePoint.java:9-47 vector analog).
    """
    if batch_id <= table.committed_batch(job_id):
        return {
            "skipped": True,
            "batch_id": batch_id,
            "events": 0,
            "committed_batch": table.committed_batch(job_id),
            "committed_watermark": table.committed_watermark(job_id),
        }
    if watermark is None:
        wm = None
    elif isinstance(watermark, dict):
        wm = {
            "sources": {
                name: {"ts": t[0].isoformat(), "lsn": int(t[1])}
                for name, t in watermark.items()
            }
        }
    else:
        wm = {"ts": watermark[0].isoformat(), "lsn": int(watermark[1])}

    if drop_deletes:
        batch_df = batch_df.filter(F.col("op") != OP_DELETE)

    stats = (
        write_lineage(batch_df, lineage_dir, job_id, batch_id)
        if lineage_dir
        else {"events": None}
    )

    # affected-bucket probe: partial-agg distinct over ≤num_buckets
    # values — a near-free scan, no payload shuffle
    bucket = table.bucket_of()
    affected = sorted(
        r["b"]
        for r in batch_df.select(bucket.alias("b")).distinct().collect()
    )
    if not affected:
        table.record_ledger(job_id, batch_id, watermark=wm)
        return {"skipped": False, "batch_id": batch_id, "events": 0, **stats}

    # batch events in table shape + version vector + tombstone flag.
    # NO pre-dedup pass: the per-key LWW over (target ∪ raw batch)
    # below subsumes it — max(struct) over the union picks the same
    # winner, in ONE payload shuffle instead of two (the map-side
    # partial combine is what used to be the lww_dedup stage).
    payload_cols = [
        c for c in batch_df.columns
        if c not in table.key_cols and c not in ("op", "op_ts", "lsn")
    ]
    winners = batch_df.select(
        *table.key_cols,
        *payload_cols,
        F.col("op_ts").alias(VERSION_TS),
        F.col("lsn").alias(VERSION_LSN),
        (F.col("op") == OP_DELETE).alias(TOMBSTONE),
    )

    cur_schema = table.schema
    merged = merge_schemas(cur_schema, winners.schema)
    evolved = merged is not cur_schema

    target = table.read(affected, include_internal=True)
    combined = _align(target, merged).unionByName(_align(winners, merged))

    # per-key LWW across (target ∪ batch): one hash aggregate with
    # map-side partial combine — commutative, skew-immune (a hot key's
    # events reduce inside each input partition before the shuffle).
    # Legacy rows without a version vector rank lowest.
    non_key = [f.name for f in merged.fields if f.name not in table.key_cols]
    packed = F.max(
        F.struct(
            F.coalesce(F.col(VERSION_TS), F.lit(_MIN_TS)).alias("__vt"),
            F.coalesce(F.col(VERSION_LSN), F.lit(-1)).alias("__vl"),
            *[F.col(c) for c in non_key],
        )
    )
    from pyspark.sql import Observation

    obs = Observation(f"merge-{job_id}-{batch_id}")
    result = (
        combined.groupBy(*table.key_cols)
        .agg(packed.alias("_w"))
        .select(
            *table.key_cols,
            *[F.col(f"_w.{c}").alias(c) for c in non_key],
        )
        .observe(obs, F.count(F.lit(1)).alias("n_keys"))
    )

    table.overwrite_buckets(
        result,
        affected,
        new_schema=merged if evolved else None,
        ledger_update={job_id: batch_id},
        ledger_watermark={job_id: wm} if wm is not None else None,
    )
    return {
        "skipped": False,
        "batch_id": batch_id,
        # rows now in the rewritten buckets — batch winners PLUS the
        # untouched keys that happened to live in the same buckets
        # (collected during the write via observe(), no extra pass).
        # NOT the batch event count; use the lineage stats for that.
        "bucket_rows": obs.get["n_keys"],
        "affected_buckets": len(affected),
        **stats,
    }


def compact_tombstones(table: SnapshotTable, watermark_ts) -> int:
    """Drop tombstones with version ts < the tail watermark.

    Once the source watermark has passed a tombstone's version, no
    event with a smaller version can still arrive, so the tombstone is
    dead weight.  Rewrites only buckets that actually hold purgeable
    tombstones.  Returns the number of buckets compacted.

    The probe is METADATA-ONLY: every commit records exact per-bucket
    ``(n tombstones, min tombstone version)`` in the snapshot, derived
    from the written files' parquet footers (see ``TOMB_TS_COL`` in
    ``table.snapshot`` — null_count arithmetic, zero data pages), so a
    maintenance cycle on a 10^10-row table touches no data files when
    nothing is purgeable.  Buckets written before tombstone tracking
    (no ``tomb`` entry) fall back to a data probe restricted to those
    buckets only, and the probed ``(n, min_ts)`` facts are written BACK
    into the snapshot (``record_bucket_tomb_stats``) so the fallback
    runs once per bucket lifetime, not once per maintenance cycle —
    the files are immutable until the bucket's next rewrite, which
    records fresh stats itself.
    """
    if TOMBSTONE not in [f.name for f in table.schema.fields]:
        return 0
    dead = F.col(TOMBSTONE) & (F.col(VERSION_TS) < F.lit(watermark_ts))
    hits: set[int] = set()
    unknown: list[int] = []
    for b, entry in table.bucket_meta().items():
        t = entry.get("tomb")
        if t is None:
            unknown.append(b)
        elif t["n"] > 0 and t["min_ts"] is not None and (
            dt.datetime.fromisoformat(t["min_ts"]) < watermark_ts
        ):
            hits.add(b)
    if unknown:
        # full (n, min_ts) probe — same restricted scan the purge
        # decision needs, but its result is recorded so the NEXT cycle
        # decides these buckets from metadata alone
        is_tomb = F.coalesce(F.col(TOMBSTONE), F.lit(False))
        probe = (
            table.read(unknown, include_internal=True)
            .groupBy(table.bucket_of().alias("b"))
            .agg(
                F.sum(is_tomb.cast("int")).alias("n"),
                F.min(F.when(is_tomb, F.col(VERSION_TS))).alias("min_ts"),
            )
            .collect()
        )
        found = {
            int(r["b"]): {
                "n": int(r["n"] or 0),
                "min_ts": r["min_ts"].isoformat()
                if (r["n"] or 0) > 0 and r["min_ts"] is not None
                else None,
            }
            for r in probe
        }
        stats = {b: found.get(b, {"n": 0, "min_ts": None}) for b in unknown}
        table.record_bucket_tomb_stats(stats)
        for b, t in stats.items():
            if t["n"] > 0 and t["min_ts"] is not None and (
                dt.datetime.fromisoformat(t["min_ts"]) < watermark_ts
            ):
                hits.add(b)
    buckets = sorted(hits)
    if not buckets:
        return 0
    kept = table.read(buckets, include_internal=True).filter(~dead)
    table.overwrite_buckets(kept, buckets)
    return len(buckets)


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
