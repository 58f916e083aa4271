"""Explicit StructTypes for the warehouse data model.

Mirrors the reference DDL (database/schema.sql:50-172) — 4 master tables, the
``stock`` snapshot fact, the ``stock_movements`` event-log fact (source of
truth; schema.sql:108-109), and the two order header/detail pairs. Schemas
are always declared, never inferred (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Enum value lists (database/schema.sql:23-44). Kept as strings + validation.
MOVEMENT_TYPES = ("IN", "OUT", "TRANSFER", "ADJUSTMENT", "RETURN")
ORDER_STATUSES = ("PENDING", "PROCESSING", "SHIPPED", "COMPLETED", "CANCELLED")
REFERENCE_TYPES = (
    "PURCHASE_ORDER",
    "SALES_ORDER",
    "STOCK_TRANSFER",
    "MANUAL_ADJUSTMENT",
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


CATEGORIES = _st(
    ("category_id", LongType(), False),
    ("name", StringType(), False),
    ("description", StringType(), True),
    ("created_at", TimestampType(), True),
)

SUPPLIERS = _st(
    ("supplier_id", LongType(), False),
    ("name", StringType(), False),
    ("contact_person", StringType(), True),
    ("email", StringType(), True),
    ("phone", StringType(), True),
    ("address", StringType(), True),
    ("created_at", TimestampType(), True),
)

WAREHOUSES = _st(
    ("warehouse_id", LongType(), False),
    ("name", StringType(), False),
    ("location_code", StringType(), True),
    ("address", StringType(), True),
    ("created_at", TimestampType(), True),
)

PRODUCTS = _st(
    ("product_id", LongType(), False),
    ("sku", StringType(), False),
    ("name", StringType(), False),
    ("description", StringType(), True),
    ("category_id", LongType(), True),
    ("supplier_id", LongType(), True),
    ("created_at", TimestampType(), True),
    ("updated_at", TimestampType(), True),
)

STOCK = _st(
    ("product_id", LongType(), False),
    ("warehouse_id", LongType(), False),
    ("quantity_on_hand", LongType(), False),
    ("reorder_point", LongType(), True),
    ("safety_stock", LongType(), True),
    ("updated_at", TimestampType(), True),
)

STOCK_MOVEMENTS = _st(
    ("movement_id", LongType(), False),
    ("product_id", LongType(), False),
    ("warehouse_id", LongType(), False),
    ("movement_type", StringType(), False),
    ("quantity", LongType(), False),  # signed; OUT legs negative (schema.sql:122 CHECK != 0)
    ("reference_type", StringType(), True),
    ("reference_id", LongType(), True),
    ("movement_date", TimestampType(), False),
    ("notes", StringType(), True),
)

PURCHASE_ORDERS = _st(
    ("po_id", LongType(), False),
    ("supplier_id", LongType(), True),
    ("warehouse_id", LongType(), True),
    ("order_date", TimestampType(), True),
    ("expected_delivery_date", TimestampType(), True),
    ("status", StringType(), True),
    ("created_at", TimestampType(), True),
)

PURCHASE_ORDER_DETAILS = _st(
    ("po_detail_id", LongType(), False),
    ("po_id", LongType(), False),
    ("product_id", LongType(), False),
    ("quantity", LongType(), False),
    ("unit_price", DoubleType(), False),
)

SALES_ORDERS = _st(
    ("so_id", LongType(), False),
    ("customer_name", StringType(), True),
    ("order_date", TimestampType(), True),
    ("status", StringType(), True),
    ("shipping_address", StringType(), True),
    ("created_at", TimestampType(), True),
)

SALES_ORDER_DETAILS = _st(
    ("so_detail_id", LongType(), False),
    ("so_id", LongType(), False),
    ("product_id", LongType(), False),
    ("warehouse_id", LongType(), True),
    ("quantity", LongType(), False),
    ("unit_price", DoubleType(), False),
)

STOCK_AUDIT_LOG = _st(
    ("operation_type", StringType(), False),
    ("product_id", LongType(), False),
    ("warehouse_id", LongType(), False),
    ("old_quantity", LongType(), True),
    ("new_quantity", LongType(), True),
)

WAREHOUSE_SCHEMAS: dict[str, StructType] = {
    "categories": CATEGORIES,
    "suppliers": SUPPLIERS,
    "warehouses": WAREHOUSES,
    "products": PRODUCTS,
    "stock": STOCK,
    "stock_movements": STOCK_MOVEMENTS,
    "purchase_orders": PURCHASE_ORDERS,
    "purchase_order_details": PURCHASE_ORDER_DETAILS,
    "sales_orders": SALES_ORDERS,
    "sales_order_details": SALES_ORDER_DETAILS,
}


def schema_problems(df, expected: StructType) -> list[str]:
    """Data-contract check (the Spark analog of the reference's DDL-enforced
    schemas, database/schema.sql): every expected field must exist with a
    compatible type. Extra columns are allowed (pandas-side enrichment is
    normal); integer widths are interchangeable. Returns problem strings,
    empty when the frame satisfies the contract."""
    integer_types = {"tinyint", "smallint", "int", "bigint"}
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    for field in expected.fields:
        want = field.dataType.simpleString()
        got = actual.get(field.name)
        if got is None:
            problems.append(f"missing column {field.name} ({want})")
        elif got != want and not (got in integer_types and want in integer_types):
            problems.append(f"column {field.name}: expected {want}, got {got}")
    return problems


def require_schema(df, expected: StructType, name: str = "frame"):
    """Raise with every violation listed (fail-fast at pipeline entry —
    schema drift surfaces here, not as a wrong aggregate 40 stages later)."""
    problems = schema_problems(df, expected)
    if problems:
        raise ValueError(f"{name} violates schema contract: " + "; ".join(problems))
    return df


def enum_violations(df, col: str, allowed: tuple[str, ...]):
    """CHECK-constraint analog (schema.sql:23-44 enums): distinct values
    outside the allowed list, with occurrence counts."""
    from pyspark.sql import functions as F

    return (
        df.filter(~F.col(col).isin(*allowed) | F.col(col).isNull())
        .groupBy(col)
        .count()
    )
