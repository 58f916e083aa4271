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


class DriftMonitorMachine(RuleBasedStateMachine):
    """Crash-interleaving model of StreamingDriftMonitor — the one
    foreachBatch member that rides _BatchLog + per-batch partition dirs
    rather than AtomicStateStore. Injected failure points: crash AFTER
    the batch_id=N dir write but BEFORE the log commit (the at-least-once
    window), a torn mid-write dir (garbage part file), and replays at or
    below the cursor. Invariant: ``report()`` returns EXACTLY the
    per-batch drift rows of every committed batch — uncommitted or torn
    dirs are invisible until their replay commits them — and each
    committed batch's rows equal the batch-equivalent drift_report
    oracle."""

    spark = None  # injected by the test wrapper

    @initialize()
    def setup(self):
        from wsspark.streaming import StreamingDriftMonitor

        self.root = tempfile.mkdtemp(prefix="driftmodel-")
        baseline = self.spark.createDataFrame(
            [(float(i % 20), str(i % 4), f"u{i % 9}") for i in range(200)],
            "v double, c string, u string",
        )
        self.baseline = baseline
        self.monitor = StreamingDriftMonitor(
            self.spark,
            self.root,
            baseline,
            numeric_cols=["v"],
            cat_cols=["c"],
            topk_cols=["u"],  # the O(k) scale path rides the same
            k=4,              # _BatchLog machinery; same crash matrix
        )
        # model: batch_id -> expected (column, kind, n_base, n_current,
        # psi, drifted) rows, from the batch-mode oracle
        self.committed: dict[int, set] = {}
        self.next_bid = 0
        self.seq = 0

    def teardown(self):
        shutil.rmtree(self.root, ignore_errors=True)

    def _batch(self, n, shift):
        self.seq += 1
        return self.spark.createDataFrame(
            [(float((i * self.seq) % 20 + shift), str(i % 3),
              f"u{(i * self.seq) % 15}")  # some values novel -> OTHER
             for i in range(n)],
            "v double, c string, u string",
        )

    def _expected(self, batch):
        from wsspark.quality import drift_report, drift_topk

        rows = drift_report(
            self.baseline, batch, numeric_cols=["v"], cat_cols=["c"]
        ).collect() + drift_topk(self.baseline, batch, ["u"], k=4).collect()
        return {
            (r.column, r.kind, r.n_base, r.n_current, round(r.psi, 9), r.drifted)
            for r in rows
        }

    @rule(n=st.integers(min_value=5, max_value=30), shift=st.integers(0, 15))
    def commit_next_batch(self, n, shift):
        batch = self._batch(n, shift)
        self.monitor.process_batch(batch, self.next_bid)
        self.committed[self.next_bid] = self._expected(batch)
        self.next_bid += 1

    @precondition(lambda self: self.next_bid > 0)
    @rule(delta=st.integers(min_value=1, max_value=3), n=st.integers(5, 20))
    def replay_old_batch(self, delta, n):
        """At-least-once replay at-or-below the cursor: must be skipped,
        leaving every committed dir untouched (the replayed payload is
        DIFFERENT data — if the guard failed, the invariant catches the
        changed rows)."""
        bid = max(0, self.next_bid - delta)
        self.monitor.process_batch(self._batch(n, 99), bid)

    @rule(n=st.integers(min_value=5, max_value=20), shift=st.integers(0, 15))
    def crash_between_dir_write_and_log_commit(self, n, shift):
        """Writer dies after the batch dir lands but before the log
        advances; restart replays the SAME batch, which must rewrite the
        dir and commit — and until then report() must not see it."""
        batch = self._batch(n, shift)
        boom = RuntimeError("injected crash before log commit")
        log = self.monitor._log
        orig = log.commit
        log.commit = lambda bid: (_ for _ in ()).throw(boom)
        try:
            self.monitor.process_batch(batch, self.next_bid)
        except RuntimeError:
            pass
        finally:
            log.commit = orig
        # the uncommitted dir exists but is invisible (checked by the
        # invariant); restart: the stream replays the same batch id
        self.monitor.process_batch(batch, self.next_bid)
        self.committed[self.next_bid] = self._expected(batch)
        self.next_bid += 1

    @rule()
    def crash_torn_dir_write(self):
        """Writer dies mid-dir-write: a garbage part file in the NEXT
        batch dir must neither surface in report() nor break the replay
        (mode=overwrite replaces the dir)."""
        d = os.path.join(
            self.monitor.drift_path, f"batch_id={self.next_bid}"
        )
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part-00000.parquet"), "wb") as f:
            f.write(b"\x00torn write, not a parquet file")

    @invariant()
    def report_sees_exactly_the_committed_batches(self):
        got: dict[int, set] = {}
        for r in self.monitor.report().collect():
            got.setdefault(int(r.batch_id), set()).add(
                (r.column, r.kind, r.n_base, r.n_current, round(r.psi, 9),
                 r.drifted)
            )
        assert got == self.committed


class TestDriftMonitorModel:
    def test_stateful(self, spark):
        DriftMonitorMachine.spark = spark
        DriftMonitorMachine.TestCase.settings = settings(
            max_examples=3,
            stateful_step_count=8,
            deadline=None,
            derandomize=True,
            suppress_health_check=list(HealthCheck),
        )
        case = DriftMonitorMachine.TestCase()
        case.runTest()
