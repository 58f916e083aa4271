"""Incremental materialized-view maintenance (IVM) for movement rollups.

The reference recomputes every report from the full fact table each run
(`etl/main.py` full-load path re-reads everything; its incremental mode,
`etl/extract/data_extractor.py` high-watermark, still re-aggregates the
whole extract).  At 100 TB a daily refresh cannot re-touch the corpus: the
standard warehouse answer is a self-maintainable materialized view — keep
the aggregate state, aggregate ONLY the delta (the rows past the last
refresh watermark), and merge by key.

Algebra (insert-only deltas, which is what an append-only movement log
produces):

- ``COUNT`` and ``SUM`` are self-maintainable: merged = base + delta.
- ``MAX`` is self-maintainable under inserts: merged = greatest(base,
  delta) (Spark's ``greatest`` ignores NULLs, so keys present on one side
  only keep their value).  Under deletes/updates MAX would need a re-scan
  of the key's history — out of scope for an append-only log and
  documented here so nobody reuses this for a CDC stream with deletes.
- ``AVG`` is derived, not stored: recomputed as merged SUM / merged COUNT
  after the merge (storing the ratio would break the algebra).

Scale shape: the merge is a keyed full-outer join of the MV store with the
delta aggregate.  The delta partial-aggregates map-side first, so the join
right side is |delta keys| (~0.1% of the corpus on a daily watermark), and
when the MV store is persisted with ``io.write_bucketed_table`` on the MV
keys the store side needs NO exchange — the only shuffle in the whole
refresh is the tiny delta finding its buckets
(tests/test_incremental.py::test_bucketed_mv_merge_shuffles_only_delta).
That is the 100 TB win: refresh cost is O(delta), not O(corpus).

Full-outer is required (new keys appear in the delta, cold keys exist only
in the base) and full-outer cannot broadcast in Spark — the bucketed store
is the correct scale path, not a hint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MV_KEYS = ("warehouse_id", "product_id")


def movement_mv(mvs: DataFrame) -> DataFrame:
    """Aggregate state of the movements MV: one row per (warehouse,
    product) with the self-maintainable measures (count, sum, max)."""
    return mvs.groupBy(*MV_KEYS).agg(
        F.count("*").alias("n_movements"),
        F.sum(F.col("quantity").cast("long")).alias("net_qty"),
        F.max("movement_date").alias("last_movement_at"),
    )


def _merged(a: str, b: str) -> Column:
    return F.coalesce(F.col(a), F.lit(0)) + F.coalesce(F.col(b), F.lit(0))


def merge_mv(base_mv: DataFrame, delta_mv: DataFrame) -> DataFrame:
    """Merge a delta aggregate into the MV state by key.

    Returns the refreshed MV with the same schema as ``movement_mv`` plus
    the derived ``avg_qty``.  ``base_mv`` may be a bucketed-table read (no
    exchange) or any DataFrame with the MV schema.
    """
    on = list(MV_KEYS)
    base = base_mv.select(
        *on,
        F.col("n_movements").alias("_bn"),
        F.col("net_qty").alias("_bq"),
        F.col("last_movement_at").alias("_bt"),
    )
    delta = delta_mv.select(
        *on,
        F.col("n_movements").alias("_dn"),
        F.col("net_qty").alias("_dq"),
        F.col("last_movement_at").alias("_dt"),
    )
    n = _merged("_bn", "_dn")
    q = _merged("_bq", "_dq")
    return (
        base.join(delta, on, "full_outer")
        .select(
            *on,
            n.alias("n_movements"),
            q.alias("net_qty"),
            # greatest skips NULLs: one-sided keys keep their own max
            F.greatest("_bt", "_dt").alias("last_movement_at"),
            F.round(q.cast("double") / n, 4).alias("avg_qty"),
        )
    )


def incremental_refresh(mvs: DataFrame, cutoff) -> DataFrame:
    """End-to-end refresh: split the log at the watermark, aggregate each
    side, merge.  Equivalent by construction to ``movement_mv`` over the
    full log plus the derived avg — the equivalence is the driver-verified
    contract (oracle = full recompute in DuckDB) and is property-tested
    across cutoffs including both degenerate ends."""
    cut = F.lit(cutoff).cast("timestamp")
    base = movement_mv(mvs.filter(F.col("movement_date") < cut))
    delta = movement_mv(mvs.filter(F.col("movement_date") >= cut))
    return merge_mv(base, delta)


def _with_avg(mv: DataFrame) -> DataFrame:
    return mv.select(
        *MV_KEYS,
        "n_movements",
        "net_qty",
        "last_movement_at",
        F.round(
            F.col("net_qty").cast("double") / F.col("n_movements"), 4
        ).alias("avg_qty"),
    )


def snapstore_mv_refresh(spark, fact_root: str, mv_root: str) -> int:
    """Self-maintaining MV over a snapstore fact table, driven by the
    store's CDC feed instead of a watermark column.

    The MV lives in its OWN snapstore whose manifest ``tag`` records the
    fact version the state reflects — cursor and state commit in ONE
    atomic manifest publish, so a crash between "computed" and
    "recorded" cannot desync them (the watermark-file equivalent has
    that window). Refresh: read the fact delta since the tagged version
    (``snap_read_changes`` — only NEW files are scanned, no watermark
    scan of resident data), aggregate it, ``merge_mv`` into the MV
    CURRENT, overwrite-commit tagged with the consumed fact version.
    Re-running at an unchanged fact version is a no-op; a fact
    OVERWRITE in the consumed range (backfill/compaction of the fact)
    makes the CDC read refuse, and the refresh falls back to an honest
    full recompute — never a silently wrong merge. The MV store's
    history doubles as free MV time travel.

    Returns the fact version the MV now reflects.
    """
    from wsspark import snapstore as ss

    fact_version = ss.snap_current_version(fact_root)
    if fact_version is None:
        raise FileNotFoundError(f"no committed fact version in {fact_root}")
    cursor = ss.snap_tag(mv_root)
    if cursor == fact_version:
        return fact_version  # idempotent no-op

    if cursor is None:
        refreshed = _with_avg(
            movement_mv(ss.snap_read(spark, fact_root, fact_version))
        )
    else:
        try:
            delta = ss.snap_read_changes(
                spark, fact_root, since=cursor, until=fact_version
            )
            base = ss.snap_read(spark, mv_root).drop("avg_qty")
            refreshed = merge_mv(base, movement_mv(delta))
        except ValueError:  # overwrite in (cursor, fact_version]
            refreshed = _with_avg(
                movement_mv(ss.snap_read(spark, fact_root, fact_version))
            )
    ss.snap_commit(refreshed, mv_root, mode="overwrite", tag=fact_version)
    return fact_version


# ---------------------------------------------------------------------------
# Change-feed-driven maintenance (true IVM: updates and deletes too)
# ---------------------------------------------------------------------------
#
# The watermark/CDC refresh above is insert-only by contract — a fact
# UPDATE or DELETE forces the honest full-recompute fallback. With the
# snapstore CHANGE DATA FEED enabled, the delta carries signed row
# changes, and COUNT/SUM become self-maintainable under ANY DML:
# insert/update_postimage rows weigh +1, delete/update_preimage rows
# weigh -1 (an update is exactly "retract the old row, assert the new
# one" — the classic incremental-view-maintenance algebra). MAX is NOT
# self-maintainable under retractions (a deleted max needs the key's
# history), so the CDF MV carries count/sum/avg only — the honest
# contract, stated instead of silently wrong.


def cdf_delta_mv(changes: DataFrame) -> DataFrame:
    """Signed per-key aggregate of a change-feed frame (columns =
    movement columns + _change_type): one map-side-combinable pass."""
    w = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1)).cast("long")
    return changes.groupBy(*MV_KEYS).agg(
        F.sum(w).alias("n_movements"),
        F.sum(w * F.col("quantity").cast("long")).alias("net_qty"),
    )


def merge_mv_cdf(base_mv: DataFrame, delta_mv: DataFrame) -> DataFrame:
    """Merge a SIGNED delta into the CDF MV state: keyed full-outer join,
    add counts and sums, DROP keys whose merged count reaches zero (the
    group vanished — keeping a 0-count row would leak deleted keys
    forever). Same O(delta) bucketed-store shape as ``merge_mv``."""
    on = list(MV_KEYS)
    base = base_mv.select(
        *on,
        F.col("n_movements").alias("_bn"),
        F.col("net_qty").alias("_bq"),
    )
    delta = delta_mv.select(
        *on,
        F.col("n_movements").alias("_dn"),
        F.col("net_qty").alias("_dq"),
    )
    n = _merged("_bn", "_dn")
    q = _merged("_bq", "_dq")
    return (
        base.join(delta, on, "full_outer")
        .select(
            *on,
            n.alias("n_movements"),
            q.alias("net_qty"),
            F.round(q.cast("double") / n, 4).alias("avg_qty"),
        )
        .filter(F.col("n_movements") != 0)
    )


def movement_mv_cdf(mvs: DataFrame) -> DataFrame:
    """Full recompute of the CDF MV shape (count/sum/avg — no MAX, see
    module note) — the initial state and the equivalence oracle."""
    return mvs.groupBy(*MV_KEYS).agg(
        F.count("*").alias("n_movements"),
        F.sum(F.col("quantity").cast("long")).alias("net_qty"),
        F.round(
            F.sum(F.col("quantity").cast("long")).cast("double")
            / F.count("*"),
            4,
        ).alias("avg_qty"),
    )


def snapstore_mv_refresh_cdf(spark, fact_root: str, mv_root: str) -> int:
    """Self-maintaining MV over a snapstore fact via the CHANGE DATA
    FEED: fact UPDATEs and DELETEs maintain the view incrementally
    instead of forcing a full recompute — refresh cost is O(changed
    rows) whatever the DML mix. Cursor protocol is identical to
    ``snapstore_mv_refresh`` (the MV store's manifest tag IS the
    consumed fact version, committed atomically with the state); a
    lineage reset (user overwrite / restore) or a pre-enable DML commit
    in the span still falls back to the honest full recompute."""
    from wsspark import snapstore as ss

    fact_version = ss.snap_current_version(fact_root)
    if fact_version is None:
        raise FileNotFoundError(f"no committed fact version in {fact_root}")
    cursor = ss.snap_tag(mv_root)
    if cursor == fact_version:
        return fact_version  # idempotent no-op

    if cursor is None:
        refreshed = movement_mv_cdf(ss.snap_read(spark, fact_root, fact_version))
    else:
        try:
            feed = ss.snap_read_changes_cdf(
                spark, fact_root, since=cursor, until=fact_version
            )
            base = ss.snap_read(spark, mv_root)
            refreshed = merge_mv_cdf(base, cdf_delta_mv(feed))
        except ValueError:  # lineage reset / pre-enable DML in the span
            refreshed = movement_mv_cdf(
                ss.snap_read(spark, fact_root, fact_version)
            )
    ss.snap_commit(refreshed, mv_root, mode="overwrite", tag=fact_version)
    return fact_version
