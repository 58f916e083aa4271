"""Inventory metrics: dead stock, turnover, days-of-inventory (SURVEY.md §2 —
A1, J1, P5, P6, A2, A3; reference etl/transform/inventory_metrics.py).

All functions take an explicit ``as_of`` timestamp instead of wall-clock
"now" so results are replayable (SURVEY.md §7.3.6).

Scale notes:
- ``last_movement`` is a map-side-combinable max over the big fact — the
  shuffle carries one row per (product, warehouse) key, not the raw events.
- The join back to ``stock`` is keyed on the snapshot's composite PK; the
  aggregated side is ≤ |stock| rows, so AQE usually broadcasts it. At 100 TB
  the fact scan dominates; everything after the partial agg is tiny.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEVER_MOVED_DAYS = 9999  # reference fillna (etl/transform/inventory_metrics.py:34)


def last_movement(
    movements: DataFrame,
    keys: tuple[str, ...] = ("product_id", "warehouse_id"),
    date_col: str = "movement_date",
) -> DataFrame:
    """A1: last movement date per key."""
    return movements.groupBy(*keys).agg(F.max(date_col).alias(date_col))


def dead_stock_report(
    stock: DataFrame,
    movements: DataFrame,
    as_of: dt.datetime | str,
    dead_stock_days: int = 180,
    keys: tuple[str, ...] = ("product_id", "warehouse_id"),
    date_col: str = "movement_date",
    qty_col: str = "quantity_on_hand",
) -> DataFrame:
    """J1 + P5 + P6: stock rows annotated with days-since-last-movement and
    the dead-stock flag (never-moved keys get 9999 days).

    Reference: etl/transform/inventory_metrics.py:24-40 — a row is dead iff
    it hasn't moved in ``dead_stock_days`` AND still has positive stock.
    """
    last = last_movement(movements, keys, date_col)
    joined = stock.join(last, list(keys), "left")
    days = F.coalesce(
        F.datediff(F.lit(as_of).cast("timestamp"), F.col(date_col)),
        F.lit(NEVER_MOVED_DAYS),
    ).cast("double")
    return joined.withColumn("days_since_last_movement", days).withColumn(
        "is_dead_stock",
        (F.col("days_since_last_movement") > F.lit(dead_stock_days))
        & (F.col(qty_col) > 0),
    )


def inventory_summary(
    dead_stock: DataFrame,
    stock: DataFrame,
    movements: DataFrame,
    so_details: DataFrame,
    qty_col: str = "quantity_on_hand",
    sold_qty_col: str = "quantity",
    date_col: str = "movement_date",
) -> DataFrame:
    """A2 + A3: one-row global inventory KPIs with the reference's exact
    division-by-zero guards (etl/transform/inventory_metrics.py:48-71):
    turnover = 0 when avg inventory <= 0; DOH = 0 when nothing sold;
    days-in-data floored at 1. Values rounded to 2 decimals (F3).

    Three independent scalar aggregations combined with a crossJoin of
    1-row frames — no data movement beyond the three partial-agg shuffles.
    """
    sold = so_details.agg(F.coalesce(F.sum(sold_qty_col), F.lit(0)).alias("total_sold"))
    inv = stock.agg(F.avg(qty_col).alias("avg_inventory"))
    span = movements.agg(
        F.greatest(
            F.datediff(F.max(date_col), F.min(date_col)), F.lit(1)
        ).alias("days_in_data")
    )
    dead = dead_stock.agg(
        F.coalesce(F.sum(F.col("is_dead_stock").cast("long")), F.lit(0)).alias(
            "total_dead_stock_items"
        )
    )
    row = sold.crossJoin(inv).crossJoin(span).crossJoin(dead)
    turnover = F.when(F.col("avg_inventory") <= 0, F.lit(0.0)).otherwise(
        F.col("total_sold") / F.col("avg_inventory")
    )
    doh = F.when(F.col("total_sold") <= 0, F.lit(0.0)).otherwise(
        F.col("avg_inventory") / F.col("total_sold") * F.col("days_in_data")
    )
    return row.select(
        "total_dead_stock_items",
        F.round(turnover, 2).alias("stock_turnover_ratio"),
        F.round(doh, 2).alias("days_of_inventory_on_hand"),
        F.round("avg_inventory", 2).alias("avg_inventory"),
        F.col("total_sold").cast("double").alias("total_units_sold"),
        F.col("days_in_data").cast("long").alias("days_in_data"),
    )
