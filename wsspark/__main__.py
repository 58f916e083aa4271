"""CLI entry point — the analog of the reference's pipeline runner
(``python main.py --load_type {full|incremental}``,
etl_pipeline/main.py:120-134): schedule-ready, one invocation = one ETL run
writing the 12 reports (plus optional HTML report and summary-table append).

    python -m wsspark --load_type full --sf-dir /root/testdata/sf0.01 \
        --output-dir /tmp/wsspark_out [--format parquet|csv|xlsx] \
        [--incremental-since "1997-01-01 00:00:00"] [--report] \
        [--summary-table analytics_daily_summary]

On a cluster the same module runs under spark-submit; locally it builds the
engine's local[N] session. Exit code 0 with "no new movements" on an empty
increment, mirroring the reference's early exit (etl_pipeline/main.py:68-70).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="wsspark", description="Warehouse Stock ETL pipeline (PySpark)."
    )
    parser.add_argument(
        "--load_type",
        choices=["full", "incremental"],
        default="full",
        help="ETL load type: 'full' or 'incremental'.",
    )
    parser.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="input table directory (parquet per table)",
    )
    parser.add_argument("--output-dir", required=True, help="report output directory")
    parser.add_argument(
        "--format", choices=["parquet", "csv", "xlsx"], default="parquet"
    )
    parser.add_argument(
        "--incremental-since",
        default=None,
        help="high-watermark timestamp for incremental loads, e.g. "
        "'1997-01-01 00:00:00' (required with --load_type incremental)",
    )
    parser.add_argument(
        "--summary-table",
        default=None,
        help="managed table to append the run-summary row to (S4)",
    )
    parser.add_argument(
        "--report",
        action="store_true",
        help="also render the HTML report (charts + narrative; PDF if "
        "weasyprint is installed)",
    )
    args = parser.parse_args(argv)

    from wsspark.pipeline import run_pipeline
    from wsspark.session import get_session

    since = args.incremental_since
    if args.load_type == "incremental" and since is None:
        # The reference reads its watermark from the summary table
        # (etl/extract/data_extractor.py:43-54); a stateless CLI run needs
        # it stated explicitly.
        parser.error("--load_type incremental requires --incremental-since")

    spark = get_session(app_name="wsspark-cli")
    written = run_pipeline(
        spark,
        args.sf_dir,
        args.output_dir,
        load_type=args.load_type,
        incremental_since=since,
        fmt=args.format,
        summary_table=args.summary_table,
    )
    if not written:
        print("no new movements since watermark; nothing to do")
        return 0
    for name, path in sorted(written.items()):
        print(f"wrote {name} -> {path}")

    if args.report:
        import datetime as dt

        from wsspark.pipeline import build_reports
        from wsspark.report.render import generate_report

        reports = build_reports(spark, args.sf_dir, incremental_since=since)
        try:
            out = generate_report(
                reports,
                args.output_dir,
                run_timestamp=dt.datetime.now(dt.timezone.utc).isoformat(),
            )
            for kind, path in sorted(out.items()):
                print(f"wrote report {kind} -> {path}")
        finally:
            reports.release()
    return 0


if __name__ == "__main__":
    sys.exit(main())
