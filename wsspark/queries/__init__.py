"""Query registry: every implemented SURVEY.md §2 operator exposed as a
(spark_fn, oracle_sql) pair for the driver's DuckDB correctness gate.

- ``spark_fn(spark, sf_dir) -> DataFrame`` — the engine's implementation.
- ``oracle_sql`` — equivalent ANSI SQL for DuckDB over the same parquet
  views, or None for non-SQL-expressible operators (those get a rows-only
  check from the driver and full pytest coverage here instead).

Float discipline: every floating aggregate is rounded identically on both
sides (money 2dp, ratios 4-6dp) so IEEE summation-order differences between
engines can't flip the driver's value hash.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str


def build_registry() -> dict[str, Query]:
    from wsspark.queries import core, llm, temporal, tpch

    registry: dict[str, Query] = {}
    for mod in (core, tpch, llm, temporal):
        for q in mod.QUERIES:
            if q.name in registry:
                raise ValueError(f"duplicate query name {q.name}")
            registry[q.name] = q
    return registry
