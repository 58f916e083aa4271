"""Warehouse performance: transfer-pattern pairing and IO activity pivot
(SURVEY.md §2 — P8, J4, A9, A10; reference
etl/transform/warehouse_performance.py).

Scale notes:
- The transfer self-join keys on the pairing id; both sides are pre-filtered
  to transfer legs (a small fraction of the fact), and the join key
  (reference_id) is high-cardinality -> no skew. AQE handles residual skew.
- The pivot enumerates the movement-type values explicitly
  (SURVEY.md A10) — never let Spark run the extra distinct-values job, and
  the output width is fixed and deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wsspark.schemas import MOVEMENT_TYPES


def transfer_legs(
    movements: DataFrame,
    type_col: str = "movement_type",
    qty_col: str = "quantity",
    wh_col: str = "warehouse_id",
    pair_keys: tuple[str, ...] = ("reference_id", "product_id"),
    transfer_type: str = "TRANSFER",
) -> tuple[DataFrame, DataFrame]:
    """P8: split TRANSFER movements into OUT (qty<0) and IN (qty>0) legs,
    renamed for pairing (etl/transform/warehouse_performance.py:17-24)."""
    t = movements.filter(F.col(type_col) == transfer_type)
    out = t.filter(F.col(qty_col) < 0).select(
        *pair_keys,
        F.col(wh_col).alias("from_warehouse_id"),
        F.col(qty_col).alias("qty_out"),
    )
    inn = t.filter(F.col(qty_col) > 0).select(
        *pair_keys,
        F.col(wh_col).alias("to_warehouse_id"),
        F.col(qty_col).alias("qty_in"),
    )
    return out, inn


def transfer_patterns(
    movements: DataFrame,
    type_col: str = "movement_type",
    qty_col: str = "quantity",
    wh_col: str = "warehouse_id",
    pair_keys: tuple[str, ...] = ("reference_id", "product_id"),
    transfer_type: str = "TRANSFER",
) -> DataFrame:
    """J4 + A9: pair the two legs of each transfer on the shared pairing key
    (the reference relies on 'reference_id unik per transfer',
    etl/transform/warehouse_performance.py:27-28), then aggregate routes:
    total_transfers = distinct transfers, total_qty = units received."""
    out, inn = transfer_legs(movements, type_col, qty_col, wh_col, pair_keys, transfer_type)
    paired = out.join(inn, list(pair_keys))
    return (
        paired.groupBy("from_warehouse_id", "to_warehouse_id")
        .agg(
            F.countDistinct(pair_keys[0]).alias("total_transfers"),
            F.sum("qty_in").alias("total_qty"),
        )
        .orderBy(F.desc("total_transfers"), "from_warehouse_id", "to_warehouse_id")
    )


def warehouse_io_summary(
    movements: DataFrame,
    group_col: str = "warehouse_id",
    type_col: str = "movement_type",
    type_values: tuple[str, ...] = MOVEMENT_TYPES,
) -> DataFrame:
    """A10: movement counts per warehouse pivoted wide by movement type,
    zero-filled. We keep ``warehouse_id`` (the golden file accidentally
    drops it via pandas index + index=False — SURVEY.md §4.3.4)."""
    return (
        movements.groupBy(group_col)
        .pivot(type_col, list(type_values))
        .count()
        .na.fill(0)
    )
