"""End-to-end pipeline orchestration (SURVEY.md §3.1).

The reference's ``python main.py --load_type {full|incremental}``
(etl/main.py:51-134) becomes a lazy DAG builder: ``build_reports`` defines
every report DataFrame without executing anything; ``run_pipeline`` triggers
the sinks. Stage boundaries of the reference map as:

- EXTRACT  -> load_tables + adapters + DQ flag/filter (quality.py)
- TRANSFORM-> the four op families; the dict-of-frames IR is a plain dict of
  *lazy* DataFrames (order dependencies like financial reading
  dead_stock_report, etl/main.py:82-85, are just composition here)
- LOAD     -> write_report per report + the appended one-row run summary
  (etl/load/data_loader.py:77-94)

Scale posture: the two shared inputs (clean movements, stock snapshot) are
cached — they feed 4+ report branches, the Spark analog of the reference's
extract-once dict reuse (etl/main.py:79-85). Every report output is a small
aggregate; nothing collects to the driver except the final run-summary row.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsspark import adapters, quality
from wsspark.io import load_tables, write_report
from wsspark.ops import financial, inventory, movements, warehouse

class Reports(dict):
    """dict of report DataFrames; ``cached`` lists the shared cached frames
    so callers can release them (``release``) when done."""

    def __init__(self, frames: dict, cached: list):
        super().__init__(frames)
        self.cached = cached

    def release(self) -> None:
        for df in self.cached:
            df.unpersist()
        self.cached.clear()


REPORT_NAMES = (
    "dead_stock_report",
    "inventory_summary",
    "daily_trends",
    "weekly_trends",
    "monthly_trends",
    "peak_days",
    "peak_months",
    "abc_analysis",
    "stock_value_report",
    "financial_summary",
    "transfer_patterns",
    "warehouse_io_summary",
)


def build_reports(
    spark: SparkSession,
    sf_dir: str,
    as_of: str = adapters.LINEITEM_AS_OF,
    dead_stock_days: int = adapters.DEAD_STOCK_DAYS,
    incremental_since: str | None = None,
) -> dict[str, DataFrame]:
    """Define all 12 reference reports (etl/load/data_loader.py:33-38) as
    lazy DataFrames over the sf_dir tables."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"]
    cached: list[DataFrame] = []

    def _cache(df: DataFrame) -> DataFrame:
        cached.append(df.cache())
        return df

    mv = adapters.movements_from_lineitem(li)
    if incremental_since is not None:
        mv = quality.incremental_filter(mv, incremental_since)
    mv = _cache(quality.dq_filter(quality.dq_flag(mv, as_of=as_of)))

    stock = _cache(adapters.stock_from_lineitem(li, t["part"]))
    so = adapters.so_details_from_lineitem(li)
    po = adapters.po_details_from_lineitem(li)

    # Shared sub-DAGs are cached: each feeds 2+ reports, and all of them are
    # key-cardinality frames (product x warehouse at most), never fact-sized.
    dead = _cache(inventory.dead_stock_report(stock, mv, as_of, dead_stock_days))
    daily = _cache(movements.daily_trends(mv))
    monthly = _cache(movements.monthly_trends(mv))

    revenue = financial.revenue_per_product(so)
    abc = _cache(financial.abc_analysis(revenue))
    avg_cost = financial.product_avg_cost(po)
    stock_value = _cache(financial.stock_value_report(stock, avg_cost))

    frames = {
        "dead_stock_report": dead,
        "inventory_summary": inventory.inventory_summary(dead, stock, mv, so),
        "daily_trends": daily,
        "weekly_trends": movements.weekly_trends(mv),
        "monthly_trends": monthly,
        "peak_days": movements.peak_day_of_week(daily),
        "peak_months": movements.peak_month(monthly),
        "abc_analysis": abc,
        "stock_value_report": stock_value,
        "financial_summary": financial.financial_summary(stock_value, abc),
        "transfer_patterns": warehouse.transfer_patterns(
            adapters.transfer_movements_from_lineitem(li)
        ),
        "warehouse_io_summary": warehouse.warehouse_io_summary(
            adapters.movements_from_lineitem(li)
        ),
    }
    return Reports(frames, cached)


def run_summary_row(
    reports: dict[str, DataFrame], run_timestamp: dt.datetime | None = None
) -> DataFrame:
    """S4: the appended analytics_daily_summary row — inventory + financial
    scalars merged with the run timestamp (etl/load/data_loader.py:77-86)."""
    inv = reports["inventory_summary"].select(
        "total_dead_stock_items", "stock_turnover_ratio", "days_of_inventory_on_hand"
    )
    fin = reports["financial_summary"].select(
        "total_inventory_value",
        F.col("abc_summary.A").alias("abc_a"),
        F.col("abc_summary.B").alias("abc_b"),
        F.col("abc_summary.C").alias("abc_c"),
    )
    ts = F.lit(run_timestamp or dt.datetime.now(dt.timezone.utc)).cast("timestamp")
    return inv.crossJoin(fin).withColumn("run_timestamp", ts)


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    output_dir: str,
    load_type: str = "full",
    incremental_since: str | None = None,
    fmt: str = "parquet",
    summary_table: str | None = None,
    run_timestamp: dt.datetime | None = None,
) -> dict[str, str]:
    """Execute the full pipeline; returns report name -> output path.

    ``load_type='incremental'`` with no new movements early-exits like the
    reference (etl/main.py:68-70).
    """
    if load_type not in ("full", "incremental"):
        raise ValueError(f"load_type must be full|incremental, got {load_type!r}")
    since = incremental_since if load_type == "incremental" else None
    reports = build_reports(spark, sf_dir, incremental_since=since)

    try:
        if since is not None:
            t = load_tables(spark, sf_dir, ("lineitem",))
            mv = quality.incremental_filter(
                adapters.movements_from_lineitem(t["lineitem"]), since
            )
            if mv.isEmpty():
                return {}

        # The report branches are independent jobs over cached shared inputs
        # — submit them concurrently and let the scheduler pack the cluster
        # (local[N] or real executors) instead of draining one branch at a
        # time.
        from concurrent.futures import ThreadPoolExecutor

        def _write(name: str) -> tuple[str, str]:
            path = os.path.join(output_dir, name)
            write_report(reports[name], path, fmt=fmt)
            return name, path

        with ThreadPoolExecutor(max_workers=min(len(REPORT_NAMES), 8)) as pool:
            written = dict(pool.map(_write, REPORT_NAMES))

        if summary_table:
            from wsspark.io import append_table

            append_table(run_summary_row(reports, run_timestamp), summary_table)
        return written
    finally:
        reports.release()
