"""Audit/CDC semantics in batch: snapshot diffing (SURVEY.md §2.8 M5;
reference dbfn/triggers.sql:9-63 writes stock_audit_log on every stock
change).

The row-trigger becomes a set-based diff between two snapshot versions:
INSERT = key only in new, DELETE = key only in old, UPDATE = key in both
with a *changed* quantity (the trigger's ``IS DISTINCT FROM`` guard,
dbfn/triggers.sql:26 — we use Spark's null-safe equality ``<=>`` negated).
A streaming variant lives in wsspark.streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: tuple[str, ...] = ("product_id", "warehouse_id"),
    qty_col: str = "quantity_on_hand",
) -> DataFrame:
    """M5: audit log rows between two snapshot versions."""
    o = old.select(*keys, F.col(qty_col).alias("old_quantity"))
    n = new.select(*keys, F.col(qty_col).alias("new_quantity"))
    joined = o.join(n, list(keys), "full_outer")
    op = (
        F.when(F.col("old_quantity").isNull(), "INSERT")
        .when(F.col("new_quantity").isNull(), "DELETE")
        .otherwise("UPDATE")
    )
    return (
        joined.withColumn("operation_type", op)
        # UPDATE rows only when the quantity actually changed
        .filter(~F.col("old_quantity").eqNullSafe(F.col("new_quantity")))
        .select(*keys, "operation_type", "old_quantity", "new_quantity")
    )
