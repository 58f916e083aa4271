"""Snapshot store: atomic manifest-pinned commits, snapshot isolation,
time travel, schema gating, optimistic concurrency, vacuum safety."""

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
