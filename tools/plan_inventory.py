"""Dump a one-line physical-plan inventory per bench-headline query:
shuffle exchanges, parquet scans, broadcast joins/exchanges, sort-merge
joins, and Python boundaries (whole-stage-codegen span counts are not
reliably printable through AQE's re-planning in this Spark version, so
the JVM-side guarantee is carried by the python column + the registry-
wide no-BatchEvalPython plan test instead). The numbers are
the structural facts the plan tests pin individually; this tool renders
them side by side so a reviewer can audit the whole headline set at a
glance (and diff the table across rounds).

Usage: python tools/plan_inventory.py [sf_dir]  (default sf0.001 — plan
shape, not data scale, is what's being inventoried; broadcast choices at
tiny SFs are noted as such in PLANS.md where they differ at scale).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench
    from wsspark.queries import build_registry
    from wsspark.queries.llm import FOLDED_QUERIES

    reg = build_registry()
    for q in FOLDED_QUERIES:
        reg.setdefault(q.name, q)  # bench times folded constituents too
    jvm = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    mode = jvm.fromString("formatted")
    print("| query | exchanges | scans | bcast | SMJ | python |")
    print("|---|---|---|---|---|---|")
    for label, name in bench.HEADLINE.items():
        if name.startswith("streaming_"):
            continue  # executes the stream on invocation; plans pinned in tests
        try:
            df = reg[name].fn(spark, sf_dir)
            p = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # pragma: no cover - inventory tool
            print(f"| {label} | ERROR: {exc} |")
            continue
        n_ex = len(re.findall(r"\(\d+\) Exchange", p))
        n_scan = len(re.findall(r"\(\d+\) Scan parquet", p))
        n_bc = len(re.findall(r"\(\d+\) Broadcast(?:Exchange|HashJoin|NestedLoopJoin)", p))
        n_smj = len(re.findall(r"\(\d+\) SortMergeJoin", p))
        py = "arrow" if ("MapInPandas" in p or "ArrowEvalPython" in p) else (
            "ROW-PYTHON" if "BatchEvalPython" in p else "-"
        )
        print(
            f"| {label} ({name}) | {n_ex} | {n_scan} | {n_bc} | {n_smj} "
            f"| {py} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
