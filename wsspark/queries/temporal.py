"""Temporal-join and event-curation queries over the events table: as-of
join (last-touch attribution), bounded range join, window deduplication,
and weekly cohort retention. Each has a DuckDB oracle twin; the Spark side
uses the single-shuffle scale patterns in wsspark.ops.temporal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wsspark.io import read_table
from wsspark.ops import temporal
from wsspark.queries import Query

RANGE_WINDOW_SEC = 3600  # "clicks in the hour before each purchase"


def q_purchase_last_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase event, the latest click by the same
    user at-or-before the purchase (last-touch attribution). NULLs when the
    user never clicked before. Union + carry-forward window — one shuffle
    keyed by user_id (ops/temporal.asof_join docstring has the cost model).
    """
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return temporal.asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_cols=("click_id", "click_ts"),
        tiebreak="click_id",
    )


ASOF_SQL = """
WITH p AS (
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
    FROM events WHERE event_type = 'purchase'
),
c AS (
    SELECT user_id, event_id AS click_id, ts AS click_ts
    FROM events WHERE event_type = 'click'
),
best AS (
    SELECT p.purchase_id, c.click_id, c.click_ts,
           row_number() OVER (
               PARTITION BY p.purchase_id
               ORDER BY c.click_ts DESC, c.click_id DESC
           ) AS rn
    FROM p JOIN c ON c.user_id = p.user_id AND c.click_ts <= p.purchase_ts
)
SELECT p.purchase_id, p.user_id, p.purchase_ts, b.click_id, b.click_ts
FROM p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (purchase_id)
"""


def q_purchase_click_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join: clicks by the same user in the hour strictly
    before each purchase. Bucketed equi-join scale path (x2 probe fanout,
    exact microsecond bound on the residue) — see ops/temporal."""
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    return temporal.bucketed_range_count(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        window_seconds=RANGE_WINDOW_SEC,
        count_alias="n_clicks_1h",
    )


RANGE_SQL = """
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       COUNT(c.event_id) AS n_clicks_1h
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY 1, 2, 3
"""


def q_event_dedup_first_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window deduplication: keep the first event per (user, type, day) —
    the standard keep-first curation op (e.g. one impression per user/day).
    One shuffle on the dedup key; row_number, not dropDuplicates, so the
    survivor is deterministic (earliest ts, then lowest id)."""
    ev = read_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    w = Window.partitionBy("user_id", "event_type", "day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_id", "user_id", "event_type", "day")
    )


DEDUP_DAILY_SQL = """
SELECT event_id, user_id, event_type, CAST(ts AS DATE) AS day
FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id, event_type, CAST(ts AS DATE)
    ORDER BY ts ASC, event_id ASC
) = 1
"""


def q_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    distinct active users per (cohort_week, activity_week). The fact is
    first shrunk to distinct (user, week) — cardinality users x weeks, not
    events — so the self-lookup joins tiny frames; week_offset makes the
    triangle readable."""
    ev = read_table(spark, sf_dir, "events")
    uw = (
        ev.select("user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week"))
        .distinct()
    )
    first = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(first, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .withColumn(
            "week_offset",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("long"),
        )
        .select("cohort_week", "week", "week_offset", "n_users")
    )


COHORT_SQL = """
WITH uw AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
    FROM events
),
first AS (
    SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1
)
SELECT cohort_week, week,
       CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT uw.user_id) AS n_users
FROM uw JOIN first USING (user_id)
GROUP BY 1, 2, 3
"""


def q_cost_history_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 cost history per product: daily unit-cost observations
    (min over the day — min of exact IEEE divisions, no summation-order
    jitter, so change detection is bit-exact across engines) collapsed into
    validity intervals by ops.temporal.scd2_intervals. The dimension-history
    table a warehouse keeps for point-in-time valuation."""
    li = read_table(spark, sf_dir, "lineitem")
    obs = (
        li.select(
            F.col("l_partkey").alias("product_id"),
            F.to_date("l_shipdate").alias("obs_date"),
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("_cost"),
        )
        .groupBy("product_id", "obs_date")
        .agg(F.min("_cost").alias("unit_cost"))
    )
    return temporal.scd2_intervals(
        obs, key="product_id", ts="obs_date", value_cols=("unit_cost",)
    )


SCD2_SQL = """
WITH obs AS (
    SELECT l_partkey AS product_id,
           CAST(l_shipdate AS DATE) AS obs_date,
           MIN(l_extendedprice / l_quantity) AS unit_cost
    FROM lineitem
    GROUP BY 1, 2
),
flagged AS (
    SELECT *,
           row_number() OVER w = 1
             OR unit_cost IS DISTINCT FROM lag(unit_cost) OVER w AS opens
    FROM obs
    WINDOW w AS (PARTITION BY product_id ORDER BY obs_date)
)
SELECT product_id,
       obs_date AS effective_from,
       COALESCE(lead(obs_date) OVER w2, DATE '2262-01-01') AS effective_to,
       unit_cost,
       lead(obs_date) OVER w2 IS NULL AS is_current,
       row_number() OVER w2 AS version
FROM flagged
WHERE opens
WINDOW w2 AS (PARTITION BY product_id ORDER BY obs_date)
"""


QUERIES = [
    Query(
        "purchase_last_click_asof",
        q_purchase_last_click_asof,
        ASOF_SQL,
        "as-of join (last-touch attribution) via union + carry-forward window",
    ),
    Query(
        "purchase_click_window_counts",
        q_purchase_click_window_counts,
        RANGE_SQL,
        "bounded range join via window-width bucketed equi-join",
    ),
    Query(
        "event_dedup_first_daily",
        q_event_dedup_first_daily,
        DEDUP_DAILY_SQL,
        "window deduplication: deterministic keep-first per (user, type, day)",
    ),
    Query(
        "weekly_cohort_retention",
        q_weekly_cohort_retention,
        COHORT_SQL,
        "weekly cohort retention over distinct (user, week) activity",
    ),
    Query(
        "cost_history_scd2",
        q_cost_history_scd2,
        SCD2_SQL,
        "SCD2 validity intervals: change-detect + close, one shared sort",
    ),
]
