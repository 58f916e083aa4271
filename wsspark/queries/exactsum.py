"""Order-independent money/ratio aggregation for oracle-hash determinism.

Summing doubles is order-dependent (partial aggregation order differs
between Spark and DuckDB), so a `ROUND(SUM(x), 2)` can land on opposite
sides of a half-cent boundary. For every monetary aggregate we instead sum
exact integer cents (`CAST(ROUND(x*100) AS BIGINT)`) — integer addition is
associative, so both engines produce the *same* long no matter the order —
and divide once at the end. The per-row round and the final division are
single deterministic FP ops, identical across engines.

This costs one multiply+round per row inside codegen — negligible — and is
exactly how money should be aggregated at 100 TB anyway (no drift).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column) -> Column:
    """Exact integer cents for a monetary expression."""
    return F.round(col * 100).cast("long")


def money_sum(col: Column) -> Column:
    """Order-independent SUM of money, as double dollars."""
    return F.sum(cents(col)).cast("double") / 100


def money_sum_sql(expr: str) -> str:
    # fully parenthesized so the expansion composes safely inside larger
    # expressions (an unparenthesized trailing /100 left-associates wrongly
    # when the result is used as a denominator)
    return f"(CAST(SUM(CAST(ROUND(({expr}) * 100, 0) AS BIGINT)) AS DOUBLE) / 100)"


def scaled_sum(col: Column, scale: int) -> Column:
    """Order-independent SUM at an arbitrary fixed-point scale."""
    return F.sum(F.round(col * scale).cast("long")).cast("double") / scale


def scaled_sum_sql(expr: str, scale: int) -> str:
    return f"(CAST(SUM(CAST(ROUND(({expr}) * {scale}, 0) AS BIGINT)) AS DOUBLE) / {scale})"
