"""AtomicStateStore: the shared exactly-once state contract every
merging foreachBatch sink rides on — versioned commits, atomic pointer
flip carrying the batch cursor, crash-window behavior, GC."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from wsspark.statestore import AtomicStateStore


def _df(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))


def test_read_before_any_commit_is_none(spark, tmp_path):
    st = AtomicStateStore(str(tmp_path / "s0"))
    assert st.read(spark) is None
    assert st.last_batch() == -1
    assert st.version() is None


def test_commit_read_roundtrip_and_cursor(spark, tmp_path):
    st = AtomicStateStore(str(tmp_path / "s1"))
    st.commit(_df(spark, 0, 5), batch_id=0)
    assert st.last_batch() == 0
    assert st.read(spark).count() == 5
    st.commit(_df(spark, 0, 9), batch_id=1)
    assert st.last_batch() == 1 and st.version() == 1
    assert st.read(spark).count() == 9


def test_crash_before_pointer_flip_preserves_old_state(spark, tmp_path):
    """The r9 advice scenario: the old overwrite-'swap' deleted the store
    before rewriting it, so a crash mid-write lost ALL state. Here the new
    version is written beside the old and only the pointer flip publishes:
    simulate the crash by writing the version dir WITHOUT flipping."""
    root = str(tmp_path / "s2")
    st = AtomicStateStore(root)
    st.commit(_df(spark, 0, 5), batch_id=0)
    # crashed attempt: v1 dir exists (even complete), pointer never flipped
    _df(spark, 0, 100).write.mode("overwrite").parquet(
        os.path.join(root, "v000000000001")
    )
    assert st.read(spark).count() == 5  # still the committed v0
    assert st.last_batch() == 0  # replay guard still points at batch 0
    # the retry overwrites the partial dir and publishes atomically
    st.commit(_df(spark, 0, 7), batch_id=1)
    assert st.read(spark).count() == 7 and st.last_batch() == 1


def test_state_and_cursor_advance_atomically(spark, tmp_path):
    """No observable instant where state is new but batch cursor old (the
    double-count window the separate _BatchLog left): the pointer is one
    JSON carrying both."""
    root = str(tmp_path / "s3")
    st = AtomicStateStore(root)
    st.commit(_df(spark, 0, 5), batch_id=3)
    with open(os.path.join(root, "CURRENT")) as f:
        ptr = json.load(f)
    assert ptr == {"version": 0, "batch_id": 3}


def test_gc_keeps_recent_versions_only(spark, tmp_path):
    root = str(tmp_path / "s4")
    st = AtomicStateStore(root)
    for b in range(5):
        st.commit(_df(spark, 0, b + 1), batch_id=b, keep=2)
    dirs = sorted(d for d in os.listdir(root) if d.startswith("v"))
    assert dirs == ["v000000000003", "v000000000004"]
    assert st.read(spark).count() == 5


def test_corrupt_pointer_reads_as_empty_not_crash(spark, tmp_path):
    root = str(tmp_path / "s5")
    os.makedirs(root)
    with open(os.path.join(root, "CURRENT"), "w") as f:
        f.write("not json")
    st = AtomicStateStore(root)
    assert st.read(spark) is None and st.last_batch() == -1
