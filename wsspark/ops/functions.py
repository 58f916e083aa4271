"""Batch equivalents of the reference's PL/pgSQL routines (SURVEY.md §2.8 —
M1 record_stock_movement, M2 transfer_stock, M3 check_reorder_points,
M4 calculate_stock_value; reference dbfn/functions.sql).

The OLTP upsert semantics become declarative recomputes: the snapshot is
*defined* as the signed sum of movements (event-sourcing invariant,
database/schema.sql:108-109; the generator derives it the same way,
gen/generate_data.py:377-380), so "apply a movement" is just "append a row
and re-aggregate" — embarrassingly parallel, no per-row transactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_from_movements(
    movements: DataFrame,
    keys: tuple[str, ...] = ("product_id", "warehouse_id"),
    qty_col: str = "quantity",
) -> DataFrame:
    """M1/A12: stock snapshot = signed sum of movement quantities per key.
    Map-side combine makes this one small shuffle regardless of fact size."""
    return movements.groupBy(*keys).agg(
        F.sum(qty_col).alias("quantity_on_hand")
    )


def apply_movements(
    stock: DataFrame,
    new_movements: DataFrame,
    keys: tuple[str, ...] = ("product_id", "warehouse_id"),
    qty_col: str = "quantity",
) -> DataFrame:
    """M1 batch upsert: merge an increment of movements into an existing
    snapshot (the `ON CONFLICT .. DO UPDATE quantity_on_hand + qty` of
    dbfn/functions.sql:35-41, as a full-outer merge)."""
    delta = snapshot_from_movements(new_movements, keys, qty_col).withColumnRenamed(
        "quantity_on_hand", "_delta"
    )
    merged = stock.join(delta, list(keys), "full_outer")
    return merged.select(
        *keys,
        (
            F.coalesce(F.col("quantity_on_hand"), F.lit(0))
            + F.coalesce(F.col("_delta"), F.lit(0))
        ).alias("quantity_on_hand"),
        *[c for c in stock.columns if c not in (*keys, "quantity_on_hand")],
    )


def validate_transfers(
    requests: DataFrame,
    stock: DataFrame,
) -> DataFrame:
    """M2 transfer_stock validation, set-based (dbfn/functions.sql:82-102).

    ``requests`` columns: transfer_id, product_id, from_warehouse_id,
    to_warehouse_id, quantity. Returns the requests annotated with
    status='OK' or the first failing rule, mirroring the reference's check
    order: quantity > 0 -> warehouses differ -> sufficient stock at source.
    """
    src = stock.select(
        F.col("product_id"),
        F.col("warehouse_id").alias("from_warehouse_id"),
        F.col("quantity_on_hand").alias("_available"),
    )
    checked = requests.join(src, ["product_id", "from_warehouse_id"], "left")
    status = (
        F.when(F.col("quantity") <= 0, "INVALID_QUANTITY")
        .when(
            F.col("from_warehouse_id") == F.col("to_warehouse_id"),
            "SAME_WAREHOUSE",
        )
        .when(
            F.coalesce(F.col("_available"), F.lit(0)) < F.col("quantity"),
            "INSUFFICIENT_STOCK",
        )
        .otherwise("OK")
    )
    return checked.withColumn("status", status).drop("_available")


def transfer_movements(validated: DataFrame, transfer_type: str = "TRANSFER") -> DataFrame:
    """M2 emission: for each OK transfer, produce the paired movement legs —
    OUT leg with -qty then IN leg with +qty, both tagged STOCK_TRANSFER and
    sharing the pairing reference (dbfn/functions.sql:104-120)."""
    ok = validated.filter(F.col("status") == "OK")
    out = ok.select(
        F.col("transfer_id").alias("reference_id"),
        "product_id",
        F.col("from_warehouse_id").alias("warehouse_id"),
        (-F.col("quantity")).alias("quantity"),
        F.lit(transfer_type).alias("movement_type"),
        F.lit("STOCK_TRANSFER").alias("reference_type"),
    )
    inn = ok.select(
        F.col("transfer_id").alias("reference_id"),
        "product_id",
        F.col("to_warehouse_id").alias("warehouse_id"),
        F.col("quantity").alias("quantity"),
        F.lit(transfer_type).alias("movement_type"),
        F.lit("STOCK_TRANSFER").alias("reference_type"),
    )
    return out.unionByName(inn)


def check_reorder_points(
    stock: DataFrame,
    products: DataFrame,
    warehouses: DataFrame,
    warehouse_id: int | None = None,
) -> DataFrame:
    """M3 + J5 + P11 + P9: parameterized reorder report
    (dbfn/functions.sql:143-176): rows where 0 < quantity_on_hand <=
    reorder_point, joined to the product/warehouse dims (broadcast), with
    the deficit column. ``warehouse_id=None`` means all warehouses."""
    filtered = stock.filter(
        (F.col("quantity_on_hand") <= F.col("reorder_point"))
        & (F.col("quantity_on_hand") > 0)
    )
    if warehouse_id is not None:
        filtered = filtered.filter(F.col("warehouse_id") == warehouse_id)
    return (
        filtered.join(F.broadcast(products), "product_id")
        .join(F.broadcast(warehouses), "warehouse_id")
        .withColumn("deficit", F.col("reorder_point") - F.col("quantity_on_hand"))
    )


def calculate_stock_value(
    stock: DataFrame,
    po_details: DataFrame,
    purchase_orders: DataFrame | None = None,
    method: str = "AVG",
    completed_only: bool = False,
) -> DataFrame:
    """M4 + J6 + J7 + A6: weighted-average stock valuation.

    The reference has two inconsistent costing definitions (SURVEY.md
    §4.3.6): the SQL path joins POs and keeps only status='COMPLETED'
    (dbfn/functions.sql:208-210), the pandas path uses all PO details
    (etl/transform/financial_metrics.py:58-62). ``completed_only`` selects
    the variant; default False = pipeline behavior (produces the goldens).

    ``method='FIFO'`` / ``'LIFO'`` go beyond the reference (which raises
    for both, dbfn/functions.sql:233-238) when ``po_details`` carries a
    ``receipt_date`` column: they dispatch to ``fifo_stock_value`` /
    ``lifo_stock_value``, whose layered-cost output schema differs from the
    AVG variant (per-product consumed-layer valuation instead of
    avg_cost x quantity — see those functions). Without ``receipt_date``
    there is no cost-layer ordering, so non-AVG methods raise
    NotImplementedError, mirroring the reference.
    """
    if method in ("FIFO", "LIFO") and "receipt_date" in po_details.columns:
        return (fifo_stock_value if method == "FIFO" else lifo_stock_value)(
            stock, po_details
        )
    if method != "AVG":
        raise NotImplementedError(f"valuation method {method!r} not implemented (reference parity)")
    details = po_details
    if completed_only:
        if purchase_orders is None:
            raise ValueError("completed_only=True requires purchase_orders")
        completed = purchase_orders.filter(F.col("status") == "COMPLETED").select("po_id")
        details = po_details.join(completed, "po_id")
    cost = details.groupBy("product_id").agg(
        F.when(F.sum("quantity") == 0, F.lit(0.0))
        .otherwise(F.sum(F.col("quantity") * F.col("unit_price")) / F.sum("quantity"))
        .alias("avg_cost")
    )
    totals = stock.groupBy("product_id").agg(
        F.sum("quantity_on_hand").alias("total_quantity")
    )
    return (
        totals.filter(F.col("total_quantity") > 0)
        .join(cost, "product_id", "left")
        .select(
            "product_id",
            "total_quantity",
            F.round(F.coalesce(F.col("avg_cost"), F.lit(0.0)), 2).alias("avg_cost"),
            F.round(
                F.col("total_quantity") * F.coalesce(F.col("avg_cost"), F.lit(0.0)), 2
            ).alias("total_value"),
        )
    )


def fifo_stock_value(
    stock: DataFrame,
    receipts: DataFrame,
    order_cols: tuple[str, ...] = ("receipt_date", "po_id", "line_no"),
) -> DataFrame:
    """FIFO valuation as a window over ordered PO receipts — the one method
    the reference names but refuses (dbfn/functions.sql:233-238).

    Under FIFO the oldest receipts are consumed first, so the on-hand
    quantity is valued at the NEWEST receipt costs: order each product's
    receipt layers newest-first, take min(layer_qty, remaining) from each
    until the on-hand total is covered, and sum layer_take * unit_price
    (cents-exact per layer, matching the DuckDB oracle bit-for-bit).

    ``receipts`` needs (product_id, quantity, unit_price, *order_cols); the
    ``order_cols`` tuple must be a deterministic total order (ties broken by
    po_id/line_no). One shuffle on product_id for the window; per-product
    layer counts are bounded (receipt history per SKU), so the partitioned
    sort holds at 100 TB — no global sort anywhere.
    """
    return _layered_stock_value(stock, receipts, order_cols, newest_first=True,
                                value_alias="fifo_value")


def lifo_stock_value(
    stock: DataFrame,
    receipts: DataFrame,
    order_cols: tuple[str, ...] = ("receipt_date", "po_id", "line_no"),
) -> DataFrame:
    """LIFO valuation: the mirror of ``fifo_stock_value``. Under LIFO the
    NEWEST receipts are consumed first, so the on-hand quantity is valued
    at the OLDEST receipt costs — identical window mechanics with the
    layer order ascending instead of descending. Completes the reference's
    declared-but-unimplemented M4 method set (dbfn/functions.sql:233-238).
    """
    return _layered_stock_value(stock, receipts, order_cols, newest_first=False,
                                value_alias="lifo_value")


def _layered_stock_value(
    stock: DataFrame,
    receipts: DataFrame,
    order_cols: tuple[str, ...],
    newest_first: bool,
    value_alias: str,
) -> DataFrame:
    from wsspark.queries import exactsum as ex

    totals = stock.groupBy("product_id").agg(
        F.sum("quantity_on_hand").alias("total_quantity")
    ).filter(F.col("total_quantity") > 0)

    order = [F.desc(c) if newest_first else F.asc(c) for c in order_cols]
    w = (
        Window.partitionBy("product_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("quantity").over(w)
    prev = cum - F.col("quantity")
    take = F.greatest(
        F.lit(0), F.least(F.col("quantity"), F.col("total_quantity") - prev)
    )
    layers = receipts.join(totals, "product_id").select(
        "product_id",
        "total_quantity",
        ex.cents(take * F.col("unit_price")).alias("_layer_cents"),
        take.alias("_take"),
    )
    return (
        layers.groupBy("product_id", "total_quantity")
        .agg(
            F.round(F.sum("_layer_cents") / 100, 2).alias(value_alias),
            F.sum("_take").alias("covered_quantity"),
        )
        .select(
            "product_id",
            "total_quantity",
            "covered_quantity",
            value_alias,
        )
    )


def with_updated_at(df: DataFrame, as_of=None, col: str = "updated_at") -> DataFrame:
    """M6 trigger_set_updated_at (dbfn/triggers.sql:72-85) as a write-path
    projection: stamp rows with the maintenance timestamp. ``as_of`` is
    injectable for replayable runs; None -> current_timestamp()."""
    ts = F.current_timestamp() if as_of is None else F.lit(as_of).cast("timestamp")
    return df.withColumn(col, ts)
