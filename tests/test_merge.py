"""MERGE semantics vs oracle replay (reference ElasticWriter.java:67-89)."""

import datetime as dt
import os

from pyspark.sql import functions as F

from cwds_jobs_spark.lineage import read_lineage
from cwds_jobs_spark.operators.merge import merge_apply
from cwds_jobs_spark.oracle import assert_matches, replay
from cwds_jobs_spark.schema import CHANGES_SCHEMA, TRANSCRIPTS_SCHEMA
from cwds_jobs_spark.synth import synth_changes
from cwds_jobs_spark.table.snapshot import SnapshotTable

TS = dt.datetime(2021, 3, 1)


def _table(spark, ws, buckets=8):
    return SnapshotTable.create(spark, ws["table"], TRANSCRIPTS_SCHEMA, num_buckets=buckets)


def _ev(conv, turn, op, sec, lsn, text=None, role="user", tool=None):
    t = TS + dt.timedelta(seconds=sec)
    if op == "D":
        return (conv, turn, op, t, lsn, None, None, None, None)
    return (conv, turn, op, t, lsn, role, text or f"{conv}/{turn}@{lsn}", tool, t)


def test_merge_iud_golden(spark, ws):
    """I creates, U overwrites full doc, D removes — the reference's
    cwsrs_{new,updated,deleted}_facility.json golden scenario."""
    tbl = _table(spark, ws)
    w1 = spark.createDataFrame(
        [_ev("a", 1, "I", 0, 1), _ev("b", 1, "I", 1, 2), _ev("c", 1, "I", 2, 3)],
        CHANGES_SCHEMA,
    )
    merge_apply(tbl, w1, job_id="j", batch_id=0)
    w2 = spark.createDataFrame(
        [_ev("x", 9, "I", 10, 4), _ev("b", 1, "U", 11, 5, text="updated"), _ev("c", 1, "D", 12, 6)],
        CHANGES_SCHEMA,
    )
    merge_apply(tbl, w2, job_id="j", batch_id=1)
    state = {
        (r["conv_id"], r["turn_idx"]): r for r in map(lambda r: r.asDict(), tbl.read().collect())
    }
    assert set(state) == {("a", 1), ("b", 1), ("x", 9)}
    assert state[("b", 1)]["text"] == "updated"


def test_delete_unknown_key_is_noop(spark, ws):
    """NOT MATCHED + D → no-op (ElasticWriter.java:80-82 logs & skips)."""
    tbl = _table(spark, ws)
    w = spark.createDataFrame([_ev("ghost", 1, "D", 0, 1)], CHANGES_SCHEMA)
    stats = merge_apply(tbl, w, job_id="j", batch_id=0)
    assert tbl.read().count() == 0 and not stats["skipped"]


def test_delete_then_reinsert_same_window(spark, ws):
    tbl = _table(spark, ws)
    merge_apply(
        tbl,
        spark.createDataFrame([_ev("a", 1, "I", 0, 1)], CHANGES_SCHEMA),
        job_id="j",
        batch_id=0,
    )
    w = spark.createDataFrame(
        [_ev("a", 1, "D", 5, 2), _ev("a", 1, "I", 6, 3, text="reborn")], CHANGES_SCHEMA
    )
    merge_apply(tbl, w, job_id="j", batch_id=1)
    rows = tbl.read().collect()
    assert len(rows) == 1 and rows[0].text == "reborn"


def test_merge_matches_oracle_random_stream(spark, ws):
    tbl = _table(spark, ws)
    all_events = []
    for i, (n, start) in enumerate([(800, 0), (800, 800), (400, 1600)]):
        w = synth_changes(spark, n, n_convs=25, start_lsn=start, ts_group=3)
        all_events += w.collect()
        merge_apply(tbl, w, job_id="j", batch_id=i)
    assert_matches(tbl.read(), replay(all_events))


def test_exactly_once_replayed_batch(spark, ws):
    """Re-delivering a committed batch id leaves table + lineage unchanged."""
    tbl = _table(spark, ws)
    w = synth_changes(spark, 500, n_convs=20)
    merge_apply(tbl, w, job_id="j", batch_id=0, lineage_dir=ws["lineage"])
    v1, rows1 = tbl.version, tbl.read().count()
    stats = merge_apply(tbl, w, job_id="j", batch_id=0, lineage_dir=ws["lineage"])
    assert stats["skipped"]
    assert tbl.version == v1 and tbl.read().count() == rows1
    lin = read_lineage(spark, ws["lineage"])
    assert lin.groupBy("batch_id").count().count() == 1
    assert lin.agg(F.sum("events_applied")).collect()[0][0] == 500


def test_bucket_pruning_rewrites_only_affected(spark, ws):
    """A one-key batch must not touch other buckets' files."""
    tbl = _table(spark, ws, buckets=8)
    merge_apply(tbl, synth_changes(spark, 2000, n_convs=100), job_id="j", batch_id=0)
    before = {b: tuple(e["files"]) for b, e in tbl._snap["buckets"].items()}
    one = spark.createDataFrame([_ev("conv_00000000", 0, "U", 99, 10**6, text="poke")], CHANGES_SCHEMA)
    stats = merge_apply(tbl, one, job_id="j", batch_id=1)
    assert stats["affected_buckets"] == 1
    after = {b: tuple(e["files"]) for b, e in tbl._snap["buckets"].items()}
    changed = [b for b in before if before[b] != after.get(b)]
    assert len(changed) <= 1


def test_atomic_snapshot_isolation(spark, ws):
    """A reader loaded before a commit keeps seeing the old version."""
    tbl = _table(spark, ws)
    merge_apply(tbl, synth_changes(spark, 300, n_convs=10), job_id="j", batch_id=0)
    old_reader = SnapshotTable.load(spark, ws["table"])
    n_old = old_reader.read().count()
    merge_apply(tbl, synth_changes(spark, 300, n_convs=10, start_lsn=300), job_id="j", batch_id=1)
    assert old_reader.read().count() == n_old  # old snapshot still intact
    assert SnapshotTable.load(spark, ws["table"]).version == tbl.version


def test_lineage_per_partition_metrics(spark, ws):
    tbl = _table(spark, ws)
    w = synth_changes(spark, 1000, n_convs=30, num_partitions=4)
    merge_apply(tbl, w, job_id="j", batch_id=0, lineage_dir=ws["lineage"])
    lin = read_lineage(spark, ws["lineage"]).collect()
    assert sum(r.events_applied for r in lin) == 1000
    assert max(r.max_lsn for r in lin) == 999
    assert len({r.partition_id for r in lin}) >= 2


def test_point_lookup_prunes_to_one_bucket(spark, ws):
    """S7 analog: SnapshotTable.lookup reads exactly one bucket."""
    from cwds_jobs_spark.schema import TRANSCRIPTS_SCHEMA
    from cwds_jobs_spark.synth import synth_changes
    from cwds_jobs_spark.table.snapshot import SnapshotTable

    tbl = SnapshotTable.create(spark, ws["table"], TRANSCRIPTS_SCHEMA, num_buckets=8)
    ev = synth_changes(spark, 500, n_convs=25)
    merge_apply(tbl, ev, job_id="pl", batch_id=0)
    key = tbl.read().select("conv_id").first()[0]
    got = sorted(
        (r.conv_id, r.turn_idx) for r in tbl.lookup(key).collect()
    )
    want = sorted(
        (r.conv_id, r.turn_idx)
        for r in tbl.read().filter(F.col("conv_id") == key).collect()
    )
    assert got == want and got
    # plan proof: the lookup scan reads 1/8 of the table's files
    n_files_lookup = len(
        tbl._snap["buckets"][
            str(
                spark.createDataFrame([(key,)], "conv_id string")
                .select(tbl.bucket_of().alias("b")).collect()[0]["b"]
            )
        ]["files"]
    )
    total_files = sum(len(e["files"]) for e in tbl._snap["buckets"].values())
    assert n_files_lookup < total_files


def test_read_changes_until_bound(spark, ws):
    """Closed change window: (after, until] — the reference's
    `< :before` leg + multisource watermark cap."""
    import os as _os

    from cwds_jobs_spark.sources.changes import read_changes
    from cwds_jobs_spark.state import SavePoint
    from cwds_jobs_spark.synth import synth_changes

    ev = synth_changes(spark, 400, n_convs=10)
    ev.write.mode("overwrite").parquet(_os.path.join(ws["changes"], "w0"))
    rows = sorted(ev.collect(), key=lambda r: (r.op_ts, r.lsn))
    lo, hi = rows[99], rows[299]
    out = read_changes(
        spark,
        ws["changes"],
        after=SavePoint(ts=lo.op_ts, lsn=lo.lsn),
        until=SavePoint(ts=hi.op_ts, lsn=hi.lsn),
    )
    got = sorted((r.op_ts, r.lsn) for r in out.collect())
    want = [(r.op_ts, r.lsn) for r in rows[100:300]]
    assert got == want
