"""Snapshot store: atomic manifest-pinned commits, snapshot isolation,
time travel, schema gating, optimistic concurrency, vacuum safety,
CDC reads, manifest-stats file skipping, exactly-once streaming sink."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from wsspark import snapstore as ss


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("val")
    )


def test_append_overwrite_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t1")
    v0 = ss.snap_commit(_df(spark, 0, 10), root)
    v1 = ss.snap_commit(_df(spark, 10, 15), root, mode="append")
    v2 = ss.snap_commit(_df(spark, 100, 102), root, mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    assert ss.snap_read(spark, root, 0).count() == 10
    assert ss.snap_read(spark, root, 1).count() == 15
    # overwrite replaced the lineage; CURRENT points at it
    cur = ss.snap_read(spark, root)
    assert {r.id for r in cur.collect()} == {100, 101}
    assert ss.snap_versions(root) == [0, 1, 2]
    # append preserves earlier rows (lineage union, not a rewrite)
    assert {r.id for r in ss.snap_read(spark, root, 1).collect()} == set(range(15))


def test_snapshot_isolation_ignores_foreign_files(spark, tmp_path):
    """Readers plan from the manifest's explicit file list: a stray
    parquet file dropped into a commit directory (orphaned task output,
    concurrent writer debris) never leaks into any version."""
    root = str(tmp_path / "t2")
    ss.snap_commit(_df(spark, 0, 5), root)
    data_root = os.path.join(root, "data")
    commit_dir = os.path.join(data_root, sorted(os.listdir(data_root))[0])
    _df(spark, 900, 905).write.parquet(str(tmp_path / "foreign"))
    foreign = [
        f for f in os.listdir(str(tmp_path / "foreign")) if f.endswith(".parquet")
    ][0]
    os.link(
        os.path.join(str(tmp_path / "foreign"), foreign),
        os.path.join(commit_dir, "zz_orphan.parquet"),
    )
    assert {r.id for r in ss.snap_read(spark, root).collect()} == set(range(5))


def test_pinned_version_stable_across_commits(spark, tmp_path):
    root = str(tmp_path / "t3")
    ss.snap_commit(_df(spark, 0, 5), root)
    pinned = ss.snap_read(spark, root, 0)
    ss.snap_commit(_df(spark, 5, 50), root, mode="append")
    ss.snap_commit(_df(spark, 0, 1), root, mode="overwrite")
    assert pinned.count() == 5  # still exactly version 0


def test_append_schema_gate_and_conflict(spark, tmp_path):
    root = str(tmp_path / "t4")
    ss.snap_commit(_df(spark, 0, 3), root)
    other = spark.range(3).select(F.col("id").cast("string").alias("id2"))
    with pytest.raises(ValueError, match="schema mismatch"):
        ss.snap_commit(other, root, mode="append")
    ss.snap_commit(other, root, mode="overwrite")  # explicit evolution ok

    # optimistic concurrency: a manifest already present for the next
    # version makes the commit fail cleanly and leave no new files behind
    nxt = ss.snap_current_version(root) + 1
    with open(ss._manifest_path(root, nxt), "x") as f:
        json.dump({"version": nxt, "parent": nxt - 1, "mode": "append",
                   "schema": other.schema.json(), "files": []}, f)
    before = {
        d: sorted(os.listdir(os.path.join(root, "data", d)))
        for d in os.listdir(os.path.join(root, "data"))
    }
    with pytest.raises(ss.SnapshotConflict):
        ss.snap_commit(other, root, mode="overwrite")
    after = {
        d: sorted(os.listdir(os.path.join(root, "data", d)))
        for d in os.listdir(os.path.join(root, "data"))
    }
    assert before == after  # the losing commit's files were cleaned up


def test_vacuum_keeps_retained_versions_readable(spark, tmp_path):
    root = str(tmp_path / "t5")
    ss.snap_commit(_df(spark, 0, 10), root)
    ss.snap_commit(_df(spark, 10, 20), root, mode="append")
    ss.snap_commit(_df(spark, 50, 55), root, mode="overwrite")
    ss.snap_commit(_df(spark, 55, 60), root, mode="append")
    removed = ss.snap_vacuum(root, keep_last=2)
    assert removed > 0  # v0/v1's files are unreferenced by v2/v3
    assert ss.snap_versions(root) == [2, 3]
    assert {r.id for r in ss.snap_read(spark, root, 2).collect()} == set(range(50, 55))
    assert {r.id for r in ss.snap_read(spark, root, 3).collect()} == set(range(50, 60))
    with pytest.raises(FileNotFoundError):
        ss.snap_read(spark, root, 0)
    with pytest.raises(ValueError, match="keep_last"):
        ss.snap_vacuum(root, keep_last=0)


def test_empty_commit_and_empty_store(spark, tmp_path):
    root = str(tmp_path / "t6")
    with pytest.raises(FileNotFoundError):
        ss.snap_read(spark, root)
    empty = spark.range(0).select(F.col("id"))
    ss.snap_commit(empty.filter(F.lit(False)), root)
    got = ss.snap_read(spark, root)
    assert got.count() == 0
    # names/types survive the manifest roundtrip; nullability is relaxed
    # to True like every Spark file-source read
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in empty.schema.fields
    ]
    with pytest.raises(ValueError, match="mode"):
        ss.snap_commit(empty, root, mode="merge")


def test_compact_is_a_version_and_preserves_pinned_reads(spark, tmp_path):
    root = str(tmp_path / "t7")
    for i in range(5):  # five tiny appends -> many small files
        ss.snap_commit(_df(spark, i * 10, (i + 1) * 10).repartition(4), root,
                       mode="append" if i else "overwrite")
    pre_version = ss.snap_current_version(root)
    pre_files = len(ss._read_manifest(root, pre_version)["files"])
    pinned = ss.snap_read(spark, root, pre_version)

    v = ss.snap_compact(spark, root)
    assert v == pre_version + 1
    post_files = len(ss._read_manifest(root, v)["files"])
    assert post_files < pre_files
    assert {r.id for r in ss.snap_read(spark, root).collect()} == set(range(50))
    # the pinned pre-compaction frame still reads its own snapshot
    assert pinned.count() == 50
    # after vacuum to the compacted version only, data still reads
    ss.snap_vacuum(root, keep_last=1)
    assert ss.snap_read(spark, root).count() == 50


def test_read_changes_is_exact_append_delta(spark, tmp_path):
    root = str(tmp_path / "t8")
    ss.snap_commit(_df(spark, 0, 10), root)
    ss.snap_commit(_df(spark, 10, 25), root, mode="append")
    ss.snap_commit(_df(spark, 25, 30), root, mode="append")
    # delta (0 -> 2] = exactly the rows versions 1 and 2 added
    delta = ss.snap_read_changes(spark, root, since=0)
    assert {r.id for r in delta.collect()} == set(range(10, 30))
    assert {r.id for r in ss.snap_read_changes(spark, root, 1, 2).collect()} == set(
        range(25, 30)
    )
    # empty delta (since == until) keeps names/types
    empty = ss.snap_read_changes(spark, root, 2, 2)
    assert empty.count() == 0 and empty.columns == ["id", "val"]
    with pytest.raises(ValueError, match="since <= until"):
        ss.snap_read_changes(spark, root, 2, 1)


def test_read_changes_refuses_overwrite_lineage(spark, tmp_path):
    """An overwrite in (since, until] means the delta is not an append
    set — the honest behavior is a refusal, not a wrong diff."""
    root = str(tmp_path / "t9")
    ss.snap_commit(_df(spark, 0, 10), root)
    ss.snap_commit(_df(spark, 50, 55), root, mode="overwrite")
    ss.snap_commit(_df(spark, 55, 60), root, mode="append")
    with pytest.raises(ValueError, match="overwrite"):
        ss.snap_read_changes(spark, root, since=0)
    # but the post-overwrite segment is a clean append delta
    assert {r.id for r in ss.snap_read_changes(spark, root, 1, 2).collect()} == set(
        range(55, 60)
    )


def test_tail_cursor_protocol(spark, tmp_path):
    root = str(tmp_path / "t10")
    ss.snap_commit(_df(spark, 0, 5), root)
    delta, cursor = ss.snap_tail(spark, root, since=0)
    assert delta.count() == 0 and cursor == 0
    ss.snap_commit(_df(spark, 5, 9), root, mode="append")
    delta, cursor = ss.snap_tail(spark, root, since=cursor)
    assert {r.id for r in delta.collect()} == {5, 6, 7, 8} and cursor == 1


def test_stats_skipping_prunes_clustered_files(spark, tmp_path):
    """Range-clustered commit + manifest min/max stats: a narrow range
    predicate plans a strict subset of files, and the pruned read equals
    the full filtered read exactly."""
    root = str(tmp_path / "t11")
    df = _df(spark, 0, 10_000).repartitionByRange(16, "id")
    ss.snap_commit(df, root, stats_cols=["id"])
    kept, total = ss.snap_prune_files(root, "id", 100, 150)
    assert total == 16 and 1 <= len(kept) <= 2  # ~selectivity x files
    got = ss.snap_read_between(spark, root, "id", 100, 150)
    assert {r.id for r in got.collect()} == set(range(100, 151))
    # files without stats are kept (skipping never changes results):
    # append WITHOUT stats_cols, then prune -> the new file always reads
    ss.snap_commit(_df(spark, 20_000, 20_010).coalesce(1), root, mode="append")
    kept2, total2 = ss.snap_prune_files(root, "id", 100, 150)
    assert total2 == 17 and len(kept2) == len(kept) + 1
    got2 = ss.snap_read_between(spark, root, "id", 100, 150)
    assert got2.count() == 51  # residual filter still exact
    # disjoint range with full stats -> zero files planned, schema kept
    ss.snap_compact(spark, root, stats_cols=["id"])
    none_df = ss.snap_read_between(spark, root, "id", -50, -1)
    assert none_df.count() == 0 and none_df.columns == ["id", "val"]


def test_stats_survive_append_and_serialize_timestamps(spark, tmp_path):
    root = str(tmp_path / "t12")
    ts = spark.range(0, 100).select(
        F.col("id"),
        F.timestamp_add("DAY", F.col("id").cast("int"), F.lit("2024-01-01").cast("timestamp")).alias("ts"),
    )
    ss.snap_commit(ts.repartitionByRange(4, "ts"), root, stats_cols=["ts"])
    import datetime as dt

    kept, total = ss.snap_prune_files(
        root, "ts", dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 10)
    )
    assert total == 4 and len(kept) == 1
    got = ss.snap_read_between(
        spark, root, "ts", dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 10)
    )
    assert got.count() == 6  # days 5..10 inclusive


def test_snap_sink_exactly_once_under_replay(spark, tmp_path):
    """The foreachBatch sink: a replayed micro-batch (same batch id) is a
    no-op; distinct ids append. This is the crash window between sink
    write and checkpoint commit, simulated directly."""
    root = str(tmp_path / "t13")
    sink = ss.snap_sink(root)
    sink(_df(spark, 0, 5), 0)
    sink(_df(spark, 5, 10), 1)
    sink(_df(spark, 5, 10), 1)  # replay -> skipped
    sink(_df(spark, 3, 4), 0)   # stale replay -> skipped
    assert ss.snap_read(spark, root).count() == 10
    assert ss.snap_versions(root) == [0, 1]
    assert ss.snap_tag(root) == 1


def test_snap_sink_end_to_end_streaming_restart(spark, tmp_path):
    """Real Structured Streaming run: file source, one file per
    micro-batch, availableNow; then new files + restart from the same
    checkpoint continues the lineage without duplicating rows."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "t14")
    _df(spark, 0, 10).coalesce(1).write.parquet(src)
    _df(spark, 10, 20).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = (
            spark.readStream.schema("id long, val long")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(ss.snap_sink(root))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert {r.id for r in ss.snap_read(spark, root).collect()} == set(range(20))
    _df(spark, 20, 30).coalesce(1).write.mode("append").parquet(src)
    run()  # restart from checkpoint: only the new file lands
    assert ss.snap_read(spark, root).count() == 30
    # the CDC read composes: everything after the first run's cursor
    tags = [ss._read_manifest(root, v)["tag"] for v in ss.snap_versions(root)]
    assert tags == sorted(tags)  # monotone batch ids
