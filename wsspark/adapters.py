"""Adapters: express the warehouse data model over the driver's TPC-H-ish
testdata (FIXTURES.md §4 mapping), so every SURVEY.md §2 operator can be
exercised — and oracle-checked — on the shared tables.

Each adapter is a pure, expression-only projection, and ships with the SQL
CTE that defines the *same* frame for the DuckDB oracle — the Spark query and
the oracle share one source-of-truth mapping:

- ``sales_order_details``  ≅ lineitem (product=l_partkey, qty=l_quantity,
  unit_price = discounted extended price / quantity, so that
  revenue = qty*price ≡ l_extendedprice*(1-l_discount))
- ``stock`` snapshot       ≅ signed sum of lineitem quantities per
  (l_partkey, l_suppkey); RETURN rows (l_returnflag='R') subtract, matching
  the signed-quantity convention (SURVEY.md §4.3.4); reorder_point ≅ p_size
- ``stock_movements``      ≅ lineitem rows timestamped by l_shipdate
- transfer legs            ≅ lineitem lines paired within an order:
  odd l_linenumber = OUT leg (negative qty) from warehouse l_suppkey,
  even l_linenumber = IN leg; pairing key (l_orderkey, pair_id) plays the
  reference's shared reference_id (dbfn/functions.sql:104-120)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic "now" injections (SURVEY.md §7.3.6). Testdata ranges:
# lineitem.l_shipdate 1995-01-02..2001-11-04, events.ts Jan 2024.
LINEITEM_AS_OF = "2002-06-01 00:00:00"
DEAD_STOCK_DAYS = 365
EVENTS_AS_OF = "2024-01-21 00:00:00"
EVENTS_WATERMARK = "2024-01-15 00:00:00"


def so_details_from_lineitem(li: DataFrame) -> DataFrame:
    """sales_order_details analog; revenue ≡ l_extendedprice*(1-l_discount)."""
    return li.select(
        F.col("l_orderkey").alias("so_id"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_suppkey").alias("warehouse_id"),
        F.col("l_quantity").alias("quantity"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) / F.col("l_quantity")).alias(
            "unit_price"
        ),
    )


SO_DETAILS_SQL = """
    SELECT l_orderkey AS so_id, l_partkey AS product_id, l_suppkey AS warehouse_id,
           l_quantity AS quantity,
           l_extendedprice * (1 - l_discount) / l_quantity AS unit_price
    FROM lineitem
"""


def signed_qty(li: DataFrame) -> DataFrame:
    """Signed movement quantity: returns subtract (l_returnflag = 'R')."""
    return li.withColumn(
        "signed_quantity",
        F.when(F.col("l_returnflag") == "R", -F.col("l_quantity")).otherwise(
            F.col("l_quantity")
        ),
    )


SIGNED_QTY_SQL = """
    SELECT *, CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END
              AS signed_quantity
    FROM lineitem
"""


def stock_from_lineitem(li: DataFrame, part: DataFrame) -> DataFrame:
    """stock snapshot analog: quantity_on_hand = Σ signed qty per
    (product, warehouse); reorder_point = p_size, safety_stock = p_size/2
    (integer), matching the generator's derived-snapshot rule
    (gen/generate_data.py:377-398)."""
    snap = (
        signed_qty(li)
        .groupBy(
            F.col("l_partkey").alias("product_id"),
            F.col("l_suppkey").alias("warehouse_id"),
        )
        .agg(F.sum("signed_quantity").cast("double").alias("quantity_on_hand"))
    )
    dims = part.select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_size").cast("long").alias("reorder_point"),
        (F.col("p_size").cast("long") / 2).cast("long").alias("safety_stock"),
    )
    return snap.join(F.broadcast(dims), "product_id", "left")


STOCK_SQL = f"""
    SELECT s.product_id, s.warehouse_id, s.quantity_on_hand,
           CAST(p.p_size AS BIGINT) AS reorder_point,
           CAST(CAST(p.p_size AS BIGINT) / 2 AS BIGINT) AS safety_stock
    FROM (
        SELECT l_partkey AS product_id, l_suppkey AS warehouse_id,
               CAST(SUM(signed_quantity) AS DOUBLE) AS quantity_on_hand
        FROM ({SIGNED_QTY_SQL})
        GROUP BY 1, 2
    ) s LEFT JOIN part p ON s.product_id = p.p_partkey
"""


def movements_from_lineitem(li: DataFrame) -> DataFrame:
    """stock_movements analog for last-movement / trend semantics."""
    return signed_qty(li).select(
        F.col("l_partkey").alias("product_id"),
        F.col("l_suppkey").alias("warehouse_id"),
        F.col("signed_quantity").alias("quantity"),
        F.col("l_shipdate").alias("movement_date"),
        F.col("l_returnflag").alias("movement_type"),
        F.col("l_orderkey").alias("reference_id"),
    )


MOVEMENTS_SQL = f"""
    SELECT l_partkey AS product_id, l_suppkey AS warehouse_id,
           signed_quantity AS quantity, l_shipdate AS movement_date,
           l_returnflag AS movement_type, l_orderkey AS reference_id
    FROM ({SIGNED_QTY_SQL})
"""


def transfer_movements_from_lineitem(li: DataFrame) -> DataFrame:
    """Paired transfer legs: lines of one order grouped in twos
    (pair_id = (l_linenumber+1) div 2); odd line = OUT (-qty) at warehouse
    l_suppkey, even line = IN (+qty). Mirrors the reference's
    same-reference_id leg pairing (gen/generate_data.py:284-311)."""
    return li.select(
        F.col("l_orderkey").alias("reference_id"),
        F.expr("(l_linenumber + 1) div 2").alias("pair_id"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_suppkey").alias("warehouse_id"),
        F.when(F.col("l_linenumber") % 2 == 1, -F.col("l_quantity"))
        .otherwise(F.col("l_quantity"))
        .alias("quantity"),
        F.lit("TRANSFER").alias("movement_type"),
    )


TRANSFER_MOVEMENTS_SQL = """
    SELECT l_orderkey AS reference_id,
           CAST((l_linenumber + 1) // 2 AS BIGINT) AS pair_id,
           l_partkey AS product_id, l_suppkey AS warehouse_id,
           CASE WHEN l_linenumber % 2 = 1 THEN -l_quantity ELSE l_quantity END
               AS quantity,
           'TRANSFER' AS movement_type
    FROM lineitem
"""


def po_details_from_lineitem(li: DataFrame) -> DataFrame:
    """purchase_order_details analog (for valuation): po = the order."""
    return li.select(
        F.col("l_orderkey").alias("po_id"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_quantity").alias("quantity"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )


PO_DETAILS_SQL = """
    SELECT l_orderkey AS po_id, l_partkey AS product_id,
           l_quantity AS quantity, l_extendedprice / l_quantity AS unit_price
    FROM lineitem
"""


def po_receipts_from_lineitem(li: DataFrame) -> DataFrame:
    """Dated purchase receipts (for FIFO layer valuation): po_details plus
    the receipt order — ship date, then (po_id, line_no) as the
    deterministic tie-break."""
    return li.select(
        F.col("l_orderkey").alias("po_id"),
        F.col("l_linenumber").cast("long").alias("line_no"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_quantity").alias("quantity"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.col("l_shipdate").alias("receipt_date"),
    )


PO_RECEIPTS_SQL = """
    SELECT l_orderkey AS po_id, CAST(l_linenumber AS BIGINT) AS line_no,
           l_partkey AS product_id, l_quantity AS quantity,
           l_extendedprice / l_quantity AS unit_price,
           l_shipdate AS receipt_date
    FROM lineitem
"""
