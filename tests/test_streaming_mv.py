"""StreamingMVMaintainer: batch-by-batch merge must equal the full
recompute, and an at-least-once replay of an already-applied batch must be
a no-op (the foreachBatch idempotence contract)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from wsspark.ops.incremental import movement_mv
from wsspark.streaming import StreamingMVMaintainer

SCHEMA = (
    "product_id long, warehouse_id long, quantity double, "
    "movement_date timestamp"
)


def mk_batch(spark, rows):
    return spark.createDataFrame(
        [(p, w, float(q), dt.datetime(2001, m, d)) for p, w, q, m, d in rows],
        SCHEMA,
    )


@pytest.fixture()
def batches(spark):
    return [
        mk_batch(spark, [(1, 10, 5, 1, 1), (1, 10, 3, 1, 2), (2, 10, 7, 1, 3)]),
        mk_batch(spark, [(1, 10, -4, 2, 1), (3, 11, 9, 2, 2)]),
        mk_batch(spark, [(2, 10, 1, 3, 1), (1, 10, 2, 3, 5), (3, 11, -9, 3, 7)]),
    ]


def state_rows(spark, store):
    from wsspark.statestore import AtomicStateStore

    df = AtomicStateStore(os.path.join(store, "mv")).read(spark)
    return sorted(tuple(r) for r in df.collect())


def test_batchwise_merge_equals_full_recompute(spark, tmp_path, batches):
    store = str(tmp_path / "store")
    m = StreamingMVMaintainer(spark, store)
    for i, b in enumerate(batches):
        m.process_batch(b, i)
    full = batches[0]
    for b in batches[1:]:
        full = full.unionByName(b)
    want = sorted(tuple(r) for r in movement_mv(full).collect())
    assert state_rows(spark, store) == want


def test_replayed_batch_is_skipped(spark, tmp_path, batches):
    store = str(tmp_path / "store")
    m = StreamingMVMaintainer(spark, store)
    m.process_batch(batches[0], 0)
    m.process_batch(batches[1], 1)
    before = state_rows(spark, store)
    # at-least-once replay: same batch_id arrives again (crash after commit)
    m.process_batch(batches[1], 1)
    m.process_batch(batches[0], 0)
    assert state_rows(spark, store) == before
    # and a fresh maintainer over the same store resumes, not restarts
    m2 = StreamingMVMaintainer(spark, store)
    m2.process_batch(batches[1], 1)  # replay across restart: still skipped
    assert state_rows(spark, store) == before
    m2.process_batch(batches[2], 2)
    full = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want = sorted(tuple(r) for r in movement_mv(full).collect())
    assert state_rows(spark, store) == want


def test_max_is_maintained_across_out_of_order_batches(spark, tmp_path):
    """last_movement_at must be the true max even when a later batch
    carries earlier event times (insert-only MAX maintenance)."""
    store = str(tmp_path / "store")
    m = StreamingMVMaintainer(spark, store)
    m.process_batch(
        mk_batch(spark, [(1, 10, 5, 6, 15)]), 0  # june
    )
    m.process_batch(
        mk_batch(spark, [(1, 10, 2, 3, 1)]), 1  # march (late arrival)
    )
    df = m.mv()
    row = df.filter(F.col("product_id") == 1).first()
    assert row.last_movement_at == dt.datetime(2001, 6, 15)
    assert row.n_movements == 2 and row.net_qty == 7


def test_cdf_stream_maintains_mv_under_dml(spark, tmp_path):
    """End-to-end continuous IVM: a readChangeFeed stream feeds the CDF
    maintainer; fact UPDATEs and DELETEs between runs maintain the view
    to exactly the full recompute over the CURRENT fact, across
    checkpoint restarts."""
    from wsspark import snapstore as ss
    from wsspark.ops.incremental import movement_mv_cdf
    from wsspark.snapsource import register
    from wsspark.streaming import StreamingCdfMVMaintainer

    register(spark)
    fact_root = str(tmp_path / "fact")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    b1 = mk_batch(
        spark, [(1, 10, 5, 1, 1), (1, 10, 3, 1, 2), (2, 10, 7, 1, 3)]
    )
    ss.snap_commit(b1, fact_root)
    ss.snap_enable_cdf(fact_root)
    m = StreamingCdfMVMaintainer(spark, store)

    def run():
        q = m.attach(
            spark.readStream.format("snapstore")
            .option("readChangeFeed", "true")
            .load(fact_root),
            ckpt,
        )
        q.awaitTermination(120)

    def want():
        return sorted(
            tuple(r)
            for r in movement_mv_cdf(
                ss.snap_read(spark, fact_root).drop(
                    "movement_date"
                )
            ).collect()
        )

    def got():
        return sorted(tuple(r) for r in m.mv().collect())

    run()
    assert got() == want()
    # DML between runs: update + delete maintain, not recompute
    ss.snap_update_where(
        spark, fact_root, "product_id = 1", {"quantity": "quantity + 10"}
    )
    ss.snap_delete_where(spark, fact_root, "product_id = 2")
    ss.snap_commit(
        mk_batch(spark, [(3, 11, 9, 2, 2)]), fact_root, mode="append"
    )
    run()
    assert got() == want()
    # product 2's group vanished entirely: dropped, not zero-lingering
    assert all(r[1] != 2 for r in got())
    run()  # restart with nothing new: no-op
    assert got() == want()


def test_cdf_stream_maintains_drift_counts_under_dml(spark, tmp_path):
    """StreamingCdfDriftMonitor (r16): the CDF stream maintains the
    cumulative (column, bucket) PSI counts through fact UPDATEs and
    DELETEs — report() equals drift_report(baseline, CURRENT fact) at
    every cursor, across checkpoint restarts; a per-batch (insert-only)
    monitor could never see the retractions."""
    from wsspark import snapstore as ss
    from wsspark.quality import drift_report
    from wsspark.snapsource import register
    from wsspark.streaming import StreamingCdfDriftMonitor

    register(spark)
    fact_root = str(tmp_path / "fact")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    b1 = mk_batch(
        spark,
        [(p, 10 + p % 3, q, 1, 1 + p % 20) for p, q in
         [(i, (i * 7) % 40 - 5) for i in range(60)]],
    )
    ss.snap_commit(b1, fact_root)
    ss.snap_enable_cdf(fact_root)
    baseline = ss.snap_read(spark, fact_root, 0)
    m = StreamingCdfDriftMonitor(
        spark, store, baseline,
        numeric_cols=["quantity"], cat_cols=["warehouse_id"],
    )

    def run():
        q = m.attach(
            spark.readStream.format("snapstore")
            .option("readChangeFeed", "true")
            .load(fact_root),
            ckpt,
        )
        q.awaitTermination(120)

    def want():
        return sorted(
            tuple(r)
            for r in drift_report(
                baseline,
                ss.snap_read(spark, fact_root),
                numeric_cols=["quantity"],
                cat_cols=["warehouse_id"],
            ).collect()
        )

    def got():
        return sorted(tuple(r) for r in m.report().collect())

    run()
    assert got() == want(), "initial replay: psi == 0 everywhere"
    assert all(r[4] == 0.0 for r in got())
    # DML between runs: a bucket-shifting update + a selective delete
    ss.snap_update_where(
        spark, fact_root, "quantity > 20", {"quantity": "quantity + 200"}
    )  # past the baseline max -> clamps into the edge bucket
    ss.snap_delete_where(spark, fact_root, "product_id % 4 = 1")
    run()
    assert got() == want()
    rep = {r.column: r for r in m.report().collect()}
    assert rep["quantity"].drifted, "the clamped mass shift must alert"
    run()  # restart with nothing new: no-op
    assert got() == want()
