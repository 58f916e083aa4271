"""Table-level expectations audit (wsspark/quality.py expectation_report)."""

from __future__ import annotations

# ---------------------------------------------------------------------------
# expectations audit
# ---------------------------------------------------------------------------


def test_expectation_report_flags_violations(spark):
    """Doctored frame: null dates, a duplicate row, an out-of-domain type
    and an out-of-bounds quantity must flip exactly the right checks."""
    import datetime as dt

    from wsspark.quality import expectation_report

    d = dt.datetime(2001, 1, 1)
    rows = [
        (1, 10, 100, 5.0, d, "A"),
        (1, 10, 100, 5.0, d, "A"),          # exact duplicate
        (2, 11, 100, 900.0, d, "XX"),       # out-of-bounds qty + bad type
        (3, 12, 101, 1.0, None, "N"),       # null movement_date
        (4, 13, 101, 1.0, d, "R"),
    ]
    df = spark.createDataFrame(
        rows,
        "reference_id long, product_id long, warehouse_id long, "
        "quantity double, movement_date timestamp, movement_type string",
    )
    got = {r.check_name: r for r in expectation_report(df).collect()}
    assert len(got) == 6
    assert got["completeness_ship_date"].metric == 0.8
    assert not got["completeness_ship_date"].passed
    assert got["uniqueness_reference_line"].metric == 0.8
    assert not got["quantity_within_bounds"].passed
    assert got["quantity_within_bounds"].metric == 900.0
    assert not got["movement_type_in_domain"].passed
    assert got["non_degenerate_quantity"].passed


def test_expectation_report_all_green_on_clean_frame(spark):
    import datetime as dt

    from wsspark.quality import expectation_report

    d = dt.datetime(2001, 1, 1)
    rows = [
        (i, i, 100 + i, float(1 + i % 50), d, "ANR"[i % 3]) for i in range(60)
    ]
    df = spark.createDataFrame(
        rows,
        "reference_id long, product_id long, warehouse_id long, "
        "quantity double, movement_date timestamp, movement_type string",
    )
    assert all(r.passed for r in expectation_report(df).collect())
