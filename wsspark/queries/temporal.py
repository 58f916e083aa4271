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
]
