"""Model-based stateful test of the snapshot store: hypothesis drives a
random sequence of appends / overwrites / evolutions / compactions /
merges / predicate deletes / vacuums against a driver-side Python model (rows + schema per version),
asserting after every step that the real store's retained versions,
metadata counts, and CURRENT content match the model exactly.

This is the invariant class example-based tests can't cover: the table
format's guarantees must hold under ARBITRARY interleavings, not just
hand-picked ones. Step and example counts are bounded because every
commit is a real Spark write (~0.5 s); ``derandomize=True`` keeps the
run deterministic in CI while still exploring dozens of interleavings.
"""

from __future__ import annotations

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

from wsspark import snapstore as ss


def _mk_df(spark, triples, with_note):
    """triples = [(id, val, note)]; note column only written when
    with_note (mirroring the schema the store holds at that point)."""
    if with_note:
        return spark.createDataFrame(
            [(i, v, n) for i, v, n in triples], "id long, val long, note string"
        )
    return spark.createDataFrame(
        [(i, v) for i, v, _ in triples], "id long, val long"
    )


class SnapstoreMachine(RuleBasedStateMachine):
    spark = None  # injected by the test wrapper

    @initialize()
    def setup(self):
        self.root = tempfile.mkdtemp(prefix="snapmodel-")
        self.next_id = 0
        # model: version -> (triples, has_note). Triples carry note=None
        # for rows written before the store evolved.
        self.versions: list[tuple[list, bool]] = []
        self.vacuumed_below = 0

    def teardown(self):
        shutil.rmtree(self.root, ignore_errors=True)

    def _fresh(self, n, noted):
        t = [
            (
                self.next_id + i,
                (self.next_id + i) * 2,
                f"n{self.next_id + i}" if noted else None,
            )
            for i in range(n)
        ]
        self.next_id += n
        return t

    def _cur(self):
        return self.versions[-1] if self.versions else ([], False)

    @rule(n=st.integers(min_value=0, max_value=7))
    def append(self, n):
        cur_rows, has_note = self._cur()
        new = self._fresh(n, noted=has_note)
        v = ss.snap_commit(
            _mk_df(self.spark, new, has_note), self.root, mode="append"
        )
        assert v == len(self.versions)
        self.versions.append((cur_rows + new, has_note))

    @rule(n=st.integers(min_value=0, max_value=7))
    def overwrite(self, n):
        new = self._fresh(n, noted=False)
        v = ss.snap_commit(
            _mk_df(self.spark, new, False), self.root, mode="overwrite"
        )
        assert v == len(self.versions)
        self.versions.append((new, False))

    @precondition(lambda self: self.versions and not self._cur()[1])
    @rule(n=st.integers(min_value=1, max_value=4))
    def evolve_append(self, n):
        cur_rows, _ = self._cur()
        new = self._fresh(n, noted=True)
        v = ss.snap_commit(
            _mk_df(self.spark, new, True),
            self.root,
            mode="append",
            evolve=True,
        )
        assert v == len(self.versions)
        self.versions.append((cur_rows + new, True))

    @precondition(lambda self: self.versions)
    @rule()
    def compact(self):
        v = ss.snap_compact(self.spark, self.root, target_file_mb=1)
        assert v == len(self.versions)
        self.versions.append(self._cur())

    @precondition(lambda self: self.versions)
    @rule(
        upd=st.integers(min_value=0, max_value=3),
        ins=st.integers(min_value=0, max_value=3),
    )
    def merge_upsert(self, upd, ins):
        """COW MERGE: replace the first `upd` current rows (val+1000,
        note kept) and insert `ins` fresh rows — model mirrors the
        update+insert clause routing exactly."""
        cur_rows, has_note = self._cur()
        upd_rows = [(i, v + 1000, n) for i, v, n in cur_rows[:upd]]
        ins_rows = self._fresh(ins, noted=has_note)
        src = upd_rows + ins_rows
        v = ss.snap_merge(
            self.spark,
            self.root,
            _mk_df(self.spark, src, has_note),
            on=["id"],
        )
        assert v == len(self.versions)
        upd_ids = {i for i, _, _ in upd_rows}
        self.versions.append(
            ([r for r in cur_rows if r[0] not in upd_ids] + src, has_note)
        )

    @precondition(lambda self: self.versions)
    @rule(modk=st.integers(min_value=2, max_value=5))
    def delete_where(self, modk):
        v = ss.snap_delete_where(self.spark, self.root, f"id % {modk} = 0")
        assert v == len(self.versions)
        cur_rows, has_note = self._cur()
        self.versions.append(
            ([r for r in cur_rows if r[0] % modk != 0], has_note)
        )

    @precondition(lambda self: len(self.versions) > 2)
    @rule(keep=st.integers(min_value=1, max_value=2))
    def vacuum(self, keep):
        ss.snap_vacuum(self.root, keep_last=keep, staged_grace_minutes=0)
        self.vacuumed_below = max(
            self.vacuumed_below, len(self.versions) - keep
        )

    @invariant()
    def retained_versions_match_model(self):
        for version in range(self.vacuumed_below, len(self.versions)):
            rows, has_note = self.versions[version]
            got = ss.snap_read(self.spark, self.root, version).collect()
            if has_note:
                have = sorted((r.id, r.val, r.note) for r in got)
                want = sorted(rows)
            else:
                have = sorted((r.id, r.val) for r in got)
                want = sorted((i, v) for i, v, _ in rows)
            assert have == want, (version, have[:5], want[:5])
            assert ss.snap_count(self.root, version) == len(rows)
        if self.versions:
            assert ss.snap_current_version(self.root) == len(self.versions) - 1


class TestSnapstoreModel:
    def test_stateful(self, spark):
        SnapstoreMachine.spark = spark
        SnapstoreMachine.TestCase.settings = settings(
            max_examples=4,
            stateful_step_count=10,
            deadline=None,
            derandomize=True,
            suppress_health_check=list(HealthCheck),
        )
        case = SnapstoreMachine.TestCase()
        case.runTest()
