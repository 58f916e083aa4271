"""Incremental MV maintenance (wsspark/ops/incremental.py).

The driver-verified contract is `incremental_refresh(log, cutoff) ==
full recompute` at one pinned cutoff; these tests widen that to the whole
cutoff range (both degenerate ends included) and pin the scale shape: with
the MV store bucketed on the MV keys, the merge's only exchange is the
delta side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wsspark import adapters as ad
from wsspark.io import read_table, write_bucketed_table
from wsspark.ops import incremental as ivm


@pytest.fixture(scope="module")
def movements(spark, sf_dir):
    mvs = ad.movements_from_lineitem(read_table(spark, sf_dir, "lineitem"))
    mvs = mvs.localCheckpoint()
    yield mvs


def full_recompute(mvs):
    state = ivm.movement_mv(mvs)
    return state.select(
        "warehouse_id",
        "product_id",
        "n_movements",
        "net_qty",
        "last_movement_at",
        F.round(
            F.col("net_qty").cast("double") / F.col("n_movements"), 4
        ).alias("avg_qty"),
    )


def as_sorted_rows(df):
    return [tuple(r) for r in df.orderBy("warehouse_id", "product_id").collect()]


@pytest.mark.parametrize(
    "cutoff",
    [
        "1990-01-01 00:00:00",  # everything is delta (base MV empty)
        "1997-01-01 00:00:00",  # interior split
        "2001-06-01 00:00:00",  # the registered query's watermark
        "2005-01-01 00:00:00",  # everything is base (delta empty)
    ],
)
def test_refresh_equals_full_recompute(movements, cutoff):
    got = as_sorted_rows(ivm.incremental_refresh(movements, cutoff))
    want = as_sorted_rows(full_recompute(movements))
    assert got == want


def test_merge_is_associative_across_three_batches(movements):
    """Two successive delta merges == one full recompute: the shape of a
    real rolling refresh (day N state + day N+1 delta + day N+2 delta)."""
    c1, c2 = "1997-01-01 00:00:00", "2000-01-01 00:00:00"
    d = F.col("movement_date")
    s0 = ivm.movement_mv(movements.filter(d < F.lit(c1).cast("timestamp")))
    d1 = ivm.movement_mv(
        movements.filter(
            (d >= F.lit(c1).cast("timestamp"))
            & (d < F.lit(c2).cast("timestamp"))
        )
    )
    d2 = ivm.movement_mv(movements.filter(d >= F.lit(c2).cast("timestamp")))
    # re-aggregate the intermediate merge back into MV state (drop avg)
    mid = ivm.merge_mv(s0, d1).drop("avg_qty")
    got = as_sorted_rows(ivm.merge_mv(mid, d2))
    want = as_sorted_rows(full_recompute(movements))
    assert got == want


def test_bucketed_mv_merge_shuffles_only_delta(spark, movements):
    """With the MV store bucketed on the MV keys, the refresh plan's only
    Exchange is the delta aggregate finding its buckets — refresh cost is
    O(delta), the whole point of keeping the state."""
    cut = F.lit("2001-06-01 00:00:00").cast("timestamp")
    # bucket count must equal the session's shuffle partitioning for the
    # delta's aggregate exchange to double as the join alignment (other
    # tests may legitimately retune spark.sql.shuffle.partitions through
    # get_session — getOrCreate re-applies confs to the shared session —
    # so read the LIVE value instead of assuming the conftest default)
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    write_bucketed_table(
        ivm.movement_mv(movements.filter(F.col("movement_date") < cut)),
        "mv_store",
        ivm.MV_KEYS,
        n_buckets=n_buckets,
        sort_cols=ivm.MV_KEYS,
    )
    try:
        delta = ivm.movement_mv(
            movements.filter(F.col("movement_date") >= cut)
        )
        merged = ivm.merge_mv(spark.table("mv_store"), delta)
        plan = merged._jdf.queryExecution().executedPlan().toString()
        n_exchange = plan.count("Exchange")
        # delta side: one exchange for its partial->final agg landing on
        # the bucket layout; the store side must contribute none.
        assert n_exchange <= 1, f"MV store side shuffled:\n{plan}"
        # and the merge still produces the recompute answer
        got = as_sorted_rows(merged)
        want = as_sorted_rows(full_recompute(movements))
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS mv_store")


def test_snapstore_mv_refresh_tracks_cdc_feed(spark, movements, tmp_path):
    """MV maintained off the snapstore CDC feed: each refresh merges only
    the delta commit, the manifest tag is the cursor (idempotent no-op at
    an unchanged fact version), a fact overwrite falls back to a full
    recompute, and the MV's own history time-travels."""
    from wsspark import snapstore as ss

    fact_root = str(tmp_path / "fact")
    mv_root = str(tmp_path / "mv")
    cut1, cut2 = "1995-01-01", "1998-01-01"
    b0 = movements.filter(F.col("movement_date") < cut1)
    b1 = movements.filter(F.col("movement_date").between(cut1, cut2))
    b2 = movements.filter(F.col("movement_date") > cut2)

    ss.snap_commit(b0, fact_root)
    assert ivm.snapstore_mv_refresh(spark, fact_root, mv_root) == 0
    assert as_sorted_rows(ss.snap_read(spark, mv_root)) == as_sorted_rows(
        full_recompute(b0)
    )

    ss.snap_commit(b1, fact_root, mode="append")
    ss.snap_commit(b2, fact_root, mode="append")
    assert ivm.snapstore_mv_refresh(spark, fact_root, mv_root) == 2
    assert as_sorted_rows(ss.snap_read(spark, mv_root)) == as_sorted_rows(
        full_recompute(movements)
    )
    # idempotent: same fact version -> no new MV version
    versions_before = ss.snap_versions(mv_root)
    assert ivm.snapstore_mv_refresh(spark, fact_root, mv_root) == 2
    assert ss.snap_versions(mv_root) == versions_before
    # MV time travel: version 0 still reflects fact version 0
    assert as_sorted_rows(ss.snap_read(spark, mv_root, 0)) == as_sorted_rows(
        full_recompute(b0)
    )
    # fact backfill (overwrite) -> CDC refuses, refresh recomputes fully
    ss.snap_commit(b1.unionByName(b2), fact_root, mode="overwrite")
    assert ivm.snapstore_mv_refresh(spark, fact_root, mv_root) == 3
    assert as_sorted_rows(ss.snap_read(spark, mv_root)) == as_sorted_rows(
        full_recompute(b1.unionByName(b2))
    )


def test_snapstore_mv_refresh_cdf_maintains_under_dml(
    spark, movements, tmp_path
):
    """CDF-driven MV maintenance: fact UPDATEs and DELETEs maintain the
    view incrementally (signed +1/-1 algebra), vanished groups drop from
    the state, and the MV always equals the full recompute over the
    CURRENT fact — across appends, updates, deletes (COW and DV), and a
    merge, with the idempotent-cursor contract intact."""
    from wsspark import snapstore as ss

    fact_root = str(tmp_path / "fact")
    mv_root = str(tmp_path / "mv")
    b1 = movements.filter("reference_id % 2 = 0").localCheckpoint()
    b2 = movements.filter("reference_id % 2 = 1").localCheckpoint()

    def expect():
        cur = ss.snap_read(spark, fact_root)
        return [
            tuple(r)
            for r in ivm.movement_mv_cdf(cur)
            .orderBy("warehouse_id", "product_id")
            .collect()
        ]

    def got():
        return [
            tuple(r)
            for r in ss.snap_read(spark, mv_root)
            .orderBy("warehouse_id", "product_id")
            .collect()
        ]

    ss.snap_commit(b1, fact_root)
    ss.snap_enable_cdf(fact_root)
    ivm.snapstore_mv_refresh_cdf(spark, fact_root, mv_root)
    assert got() == expect()

    # append + COW update + DV delete + COW delete in one span
    ss.snap_commit(b2, fact_root, mode="append")
    ss.snap_update_where(
        spark, fact_root, "quantity > 30", {"quantity": "quantity - 30"}
    )
    ss.snap_delete_dv(spark, fact_root, "reference_id % 11 = 3")
    ss.snap_delete_where(spark, fact_root, "reference_id % 17 = 5")
    v = ivm.snapstore_mv_refresh_cdf(spark, fact_root, mv_root)
    assert got() == expect()

    # a whole warehouse vanishes: its MV keys must drop, not linger at 0
    some_wh = ss.snap_read(spark, fact_root).select("warehouse_id").first()[0]
    ss.snap_delete_where(spark, fact_root, f"warehouse_id = {some_wh}")
    ivm.snapstore_mv_refresh_cdf(spark, fact_root, mv_root)
    assert got() == expect()
    assert all(r[0] != some_wh for r in got())

    # idempotent at an unchanged fact version
    versions_before = ss.snap_versions(mv_root)
    ivm.snapstore_mv_refresh_cdf(spark, fact_root, mv_root)
    assert ss.snap_versions(mv_root) == versions_before

    # lineage reset falls back to the honest full recompute
    ss.snap_commit(b1, fact_root, mode="overwrite")
    ss.snap_enable_cdf(fact_root)
    ivm.snapstore_mv_refresh_cdf(spark, fact_root, mv_root)
    assert got() == expect()


def test_snapstore_mv_refresh_cdf_under_replace_where(
    spark, movements, tmp_path
):
    """An atomic region swap (snap_overwrite_where) streams as
    delete+insert through the change feed — the MV maintainer's signed
    retraction algebra must absorb it exactly (deleted region retracts,
    replacement rows add, and the MV equals the full recompute)."""
    from wsspark import snapstore as ss

    fact_root = str(tmp_path / "factrw")
    mv_root = str(tmp_path / "mvrw")
    ss.snap_commit(movements.localCheckpoint(), fact_root)
    ss.snap_enable_cdf(fact_root)
    ivm.snapstore_mv_refresh_cdf(spark, fact_root, mv_root)

    # replacement: the quantity >= 50 region, re-stated with +100 qty
    # (still satisfies the predicate) and only for even reference_ids —
    # the region shrinks, so both deletes and inserts are nontrivial
    repl = (
        ss.snap_read(spark, fact_root)
        .filter("quantity >= 50 and reference_id % 2 = 0")
        .withColumn("quantity", F.col("quantity") + F.lit(100))
        .localCheckpoint()
    )
    ss.snap_overwrite_where(spark, fact_root, "quantity >= 50", repl)
    ivm.snapstore_mv_refresh_cdf(spark, fact_root, mv_root)

    cur = ss.snap_read(spark, fact_root)
    expect = [
        tuple(r)
        for r in ivm.movement_mv_cdf(cur)
        .orderBy("warehouse_id", "product_id")
        .collect()
    ]
    got = [
        tuple(r)
        for r in ss.snap_read(spark, mv_root)
        .orderBy("warehouse_id", "product_id")
        .collect()
    ]
    assert got == expect
