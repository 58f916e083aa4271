"""Schema contract enforcement: the DDL-analog checks at pipeline entry."""

from __future__ import annotations

import pytest

from wsspark import schemas


def test_schema_problems_detects_missing_and_mismatched(spark):
    df = spark.createDataFrame(
        [(1, 1, "IN")], ["movement_id", "product_id", "movement_type"]
    )
    problems = schemas.schema_problems(df, schemas.STOCK_MOVEMENTS)
    assert any("missing column warehouse_id" in p for p in problems)
    assert any("missing column quantity" in p for p in problems)


def test_integer_widths_are_compatible(spark):
    df = spark.createDataFrame(
        [(1, 1, 1, "IN", 5, None, None, None, None)],
        "movement_id INT, product_id INT, warehouse_id INT, movement_type STRING,"
        "quantity INT, reference_type STRING, reference_id INT,"
        "movement_date TIMESTAMP, notes STRING",
    )
    # int vs declared bigint must NOT be a violation; NOT NULL-ness is not
    # checked structurally (movement_date nullability comes from the data)
    assert schemas.schema_problems(df, schemas.STOCK_MOVEMENTS) == []


def test_require_schema_raises_with_all_problems(spark):
    df = spark.createDataFrame([(1,)], ["product_id"])
    with pytest.raises(ValueError, match="missing column quantity_on_hand"):
        schemas.require_schema(df, schemas.STOCK, name="stock")


def test_enum_violations(spark):
    df = spark.createDataFrame(
        [(1, "IN"), (2, "OUT"), (3, "TELEPORT"), (4, "TELEPORT"), (5, None)],
        ["id", "movement_type"],
    )
    bad = {
        r["movement_type"]: r["count"]
        for r in schemas.enum_violations(
            df, "movement_type", schemas.MOVEMENT_TYPES
        ).collect()
    }
    assert bad == {"TELEPORT": 2, None: 1}
