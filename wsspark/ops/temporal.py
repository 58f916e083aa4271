"""Temporal join operators Spark lacks natively: as-of join and bounded
range join. Both are implemented as single-shuffle compositions of built-in
DataFrame ops — no UDFs, no driver loops — so they survive a 100 TB fact.

As-of join (``asof_join``): the classic "latest right row at-or-before each
left row" lookup (point-in-time price, last-touch attribution). The naive
formulation is an inequality join (quadratic per key) or a per-key sort +
merge (what kdb+/pandas ``merge_asof`` do single-node). The Spark-first
shape used here is the union + carry-forward pattern:

    1. tag right rows side=0, left rows side=1, union by a common schema;
    2. one shuffle: Window.partitionBy(key).orderBy(ts, side, tiebreak)
       with ``last(value, ignorenulls=True)`` over UNBOUNDED PRECEDING..
       CURRENT ROW carries each right value forward to the next left rows;
    3. keep side=1 rows.

Cost: ONE exchange of |L|+|R| rows keyed by the join key (AQE handles skew),
versus the O(|L|x|R| per key) inequality join. Ordering (ts, side, tiebreak)
makes the join *inclusive* (a right row at exactly left.ts wins) and
deterministic under same-ts duplicates (max tiebreak wins).

Range join (``bucketed_range_count``): "count right rows within a bounded
time window before each left row". A raw inequality join degenerates to
per-key cross products; the scale path buckets time at the window width so
each left row probes exactly two buckets via an EQUI-join (bucket, key),
then the exact bound filters the residue. Shuffle volume is |L|*2 + |R|
rows, codegen-friendly, and AQE-skew-splittable — the same trick Flink's
interval join and range-partitioned genomics joins use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: tuple[str, ...],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward (inclusive) as-of join: every ``left`` row gains the
    ``right_cols`` of the latest ``right`` row with the same ``on`` key and
    ``right_ts`` <= ``left_ts`` (NULLs when no prior right row exists).

    ``tiebreak`` (a right column, e.g. an event id) pins which right row
    wins when several share one timestamp — required for deterministic
    output; the max tiebreak wins, matching a
    ``row_number() OVER (ORDER BY ts DESC, tiebreak DESC) = 1`` oracle.

    All ``right_cols`` are carried as ONE struct with a single
    ``last(ignorenulls=True)``: the struct is non-null on every right row
    even when its members are NULL, so (a) a legitimately-NULL value in the
    matched right row survives (a per-column carry would skip past it to an
    older row's value), and (b) every carried column comes from the SAME
    right row — matching pandas ``merge_asof``, which joins rows, not
    columns.
    """
    carried = [f"_asof_{c}" for c in right_cols]
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        tb.alias("_tb"),
        F.struct(
            *[F.col(c).alias(a) for c, a in zip(right_cols, carried)]
        ).alias("_payload"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    # unionByName with the left's extra payload columns nulled on the right
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_carry", F.last("_payload", ignorenulls=True).over(w))
    out_names = [
        (c if c not in left.columns else f"{c}_right") for c in right_cols
    ]
    return u.filter(F.col("_side") == 1).select(
        *left.columns,
        *[
            F.col(f"_carry.{a}").alias(o)
            for a, o in zip(carried, out_names)
        ],
    )


def bucketed_range_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    count_alias: str = "n_in_window",
) -> DataFrame:
    """Count ``right`` rows per ``left`` row with the same ``on`` key and
    ``right_ts`` in [``left_ts`` - window, ``left_ts``).

    Bucket width == window width, so every left row's window spans at most
    two buckets: the probe side explodes x2 (bounded, not data-dependent),
    the join is a pure equi-join on (key, bucket), and the exact inequality
    only filters the two-bucket residue. A LEFT join + count of non-null
    matches keeps zero-match rows without re-scanning the left side for a
    join-back. ``left`` rows must be distinct tuples (they're the grouping
    key that collapses the x2 probe fanout).
    """
    # Microsecond integer arithmetic end-to-end: timestamps carry sub-second
    # precision, and a seconds-truncated bound would mis-include boundary
    # rows versus an exact-timestamp oracle. `div` keeps bucketing exact.
    wus = F.lit(window_seconds * 1_000_000)
    lb = left.select(
        "*",
        F.unix_micros(F.col(left_ts)).alias("_lus"),
        F.explode(
            F.array(
                F.expr(f"unix_micros(`{left_ts}`) div {window_seconds * 1_000_000} - 1"),
                F.expr(f"unix_micros(`{left_ts}`) div {window_seconds * 1_000_000}"),
            )
        ).alias("_bucket"),
    )
    rb = right.select(
        F.col(on).alias("_rkey"),
        F.unix_micros(F.col(right_ts)).alias("_rus"),
        F.expr(f"unix_micros(`{right_ts}`) div {window_seconds * 1_000_000}").alias(
            "_bucket"
        ),
    )
    return (
        lb.join(
            rb,
            (lb[on] == rb["_rkey"])
            & (lb["_bucket"] == rb["_bucket"])
            & (rb["_rus"] >= lb["_lus"] - wus)
            & (rb["_rus"] < lb["_lus"]),
            "left",
        )
        .groupBy(*[lb[c] for c in left.columns])
        .agg(F.count(rb["_rus"]).alias(count_alias))
    )


# High-date sentinel for the open version. The classic choice is 9999-12-31,
# but that overflows nanosecond datetime64 (max 2262-04-11), which Arrow/
# pandas-based consumers of the history table may normalize to — so default
# to the largest round ns-safe year instead.
SCD2_OPEN_END = "2262-01-01"


def scd2_intervals(
    observations: DataFrame,
    key: str,
    ts: str,
    value_cols: tuple[str, ...],
) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse a per-key time series of
    attribute observations into validity intervals, emitting a new version
    only when a tracked value actually changes.

    The pandas/SQL-procedural version of this is a sorted per-key loop; the
    Spark-first shape is two window passes over ONE (key, ts) sort:

        1. change detection: a row opens a new version iff any value_col
           differs (null-safely) from its lag — pure expressions;
        2. interval close: effective_to = lead(effective_from) over the
           surviving version rows; the open (current) version closes at the
           SCD2_OPEN_END high-date sentinel, so range probes stay simple
           BETWEENs and the column is never NULL.

    Both windows share the same partitioning/ordering, so Catalyst reuses a
    single exchange + sort — the whole operator is one shuffle of the
    observation stream, no self-join against history. At 100 TB the
    observations arrive date-partitioned and the shuffle is the only
    movement; version counts per key are bounded by actual change
    frequency, never by scan size.
    """
    w = Window.partitionBy(key).orderBy(ts)
    changed = F.lit(False)
    for c in value_cols:
        # null-safe "differs from previous" (IS DISTINCT FROM lag)
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.row_number().over(w) == 1
    versions = observations.withColumn("_open", first | changed).filter("_open")
    wv = Window.partitionBy(key).orderBy(ts)
    ts_type = observations.schema[ts].dataType
    nxt = F.lead(ts).over(wv)
    return versions.select(
        F.col(key),
        F.col(ts).alias("effective_from"),
        F.coalesce(nxt, F.lit(SCD2_OPEN_END).cast(ts_type)).alias("effective_to"),
        *value_cols,
        nxt.isNull().alias("is_current"),
        F.row_number().over(wv).cast("long").alias("version"),
    )
