"""Movement/trend analytics: calendar resampling with gap-fill, peak-period
detection (SURVEY.md §2 — P10, W1, W3, A11, A13; reference
etl/transform/movement_analytics.py).

The genuinely fiddly piece (SURVEY.md §4.3.1) is pandas ``resample`` parity:
- empty buckets appear with count 0 (gap-fill), and
- weekly buckets are labeled by their *ending Sunday* (``W-SUN``), monthly
  buckets by month end (``ME``).

We reproduce this with a bucket-label expression + a ``sequence()``-generated
calendar exploded and left-joined to the counts. The calendar is derived from
the already-aggregated counts frame (tiny), so gap-fill costs nothing at
scale — the only heavy operation is the map-side-combinable count over the
fact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RESAMPLE_UNITS = ("D", "W", "M")


def bucket_label(date_col: str, unit: str) -> Column:
    """Pandas-parity bucket label (DateType) for a timestamp column.

    D -> the calendar date; W -> the Sunday ending the week (pandas W-SUN:
    Spark dayofweek() is 1=Sunday..7=Saturday, so we add (8 - dow) % 7 days);
    M -> last day of the month.
    """
    d = F.to_date(F.col(date_col))
    if unit == "D":
        return d
    if unit == "W":
        return F.date_add(d, (F.lit(8) - F.dayofweek(d)) % 7)
    if unit == "M":
        return F.last_day(d)
    raise ValueError(f"unit must be one of {RESAMPLE_UNITS}, got {unit!r}")


def resample_counts(
    df: DataFrame,
    unit: str,
    date_col: str = "movement_date",
    count_col: str = "n_movements",
    label_col: str = "bucket_date",
) -> DataFrame:
    """W1: event counts per calendar bucket, gap-filled with zeros between
    the first and last observed bucket (pandas ``resample('D'|'W-SUN'|'ME')``
    row-count parity)."""
    counts = df.groupBy(bucket_label(date_col, unit).alias(label_col)).agg(
        F.count("*").alias(count_col)
    )
    if unit == "D":
        step, lo, hi = "interval 1 day", F.min(label_col), F.max(label_col)
    elif unit == "W":
        step, lo, hi = "interval 7 days", F.min(label_col), F.max(label_col)
    else:  # M: step over month starts, then label with month end
        step = "interval 1 month"
        lo = F.trunc(F.min(label_col), "MM")
        hi = F.trunc(F.max(label_col), "MM")
    bounds = counts.agg(lo.alias("lo"), hi.alias("hi"))
    cal = bounds.select(
        F.explode(F.expr(f"sequence(lo, hi, {step})")).alias(label_col)
    )
    if unit == "M":
        cal = cal.select(F.last_day(F.col(label_col)).alias(label_col))
    return (
        cal.join(counts, label_col, "left")
        .select(
            F.col(label_col),
            F.coalesce(F.col(count_col), F.lit(0)).alias(count_col),
        )
    )


def daily_trends(df: DataFrame, date_col: str = "movement_date") -> DataFrame:
    """Daily counts + day-of-week name (golden daily_trends schema)."""
    out = resample_counts(df, "D", date_col, "daily_movements", "bucket_date")
    return out.withColumn("day_of_week", F.date_format("bucket_date", "EEEE"))


def weekly_trends(df: DataFrame, date_col: str = "movement_date") -> DataFrame:
    return resample_counts(df, "W", date_col, "weekly_movements", "bucket_date")


def monthly_trends(df: DataFrame, date_col: str = "movement_date") -> DataFrame:
    out = resample_counts(df, "M", date_col, "monthly_movements", "bucket_date")
    return out.withColumn("month_name", F.date_format("bucket_date", "MMMM"))


def peak_day_of_week(daily: DataFrame, count_col: str = "daily_movements") -> DataFrame:
    """A11: average movements per day-of-week, busiest first (ties broken by
    name for determinism — pandas relied on stable sort)."""
    return (
        daily.groupBy("day_of_week")
        .agg(F.round(F.avg(count_col), 2).alias("avg_movements"))
        .orderBy(F.desc("avg_movements"), F.asc("day_of_week"))
    )


def peak_month(monthly: DataFrame, count_col: str = "monthly_movements") -> DataFrame:
    """A11: average movements per month name, busiest first."""
    return (
        monthly.groupBy("month_name")
        .agg(F.round(F.avg(count_col), 2).alias("avg_movements"))
        .orderBy(F.desc("avg_movements"), F.asc("month_name"))
    )
