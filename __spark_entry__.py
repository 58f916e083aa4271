"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship ABC/Pareto query on sf0.001; ``queries`` /
``oracle_sql`` expose every implemented SURVEY.md §2 operator with its
DuckDB oracle (see wsspark/queries/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wsspark.queries import build_registry

_REGISTRY = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _REGISTRY["abc_analysis"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}
