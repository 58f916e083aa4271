"""Pipeline orchestration tests: full run writes all 12 reports; incremental
with a future watermark early-exits; summary row merges the right scalars."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from wsspark import pipeline


def test_full_pipeline_writes_all_reports(spark, sf_dir, tmp_path):
    out = str(tmp_path / "reports")
    written = pipeline.run_pipeline(spark, sf_dir, out, load_type="full")
    assert set(written) == set(pipeline.REPORT_NAMES)
    for name, path in written.items():
        df = spark.read.parquet(path)
        assert df.count() > 0, name


def test_incremental_early_exit(spark, sf_dir, tmp_path):
    out = str(tmp_path / "reports")
    written = pipeline.run_pipeline(
        spark,
        sf_dir,
        out,
        load_type="incremental",
        incremental_since="2100-01-01 00:00:00",
    )
    assert written == {}
    assert not os.path.exists(os.path.join(out, "abc_analysis"))


def test_run_summary_row_shape(spark, sf_dir):
    reports = pipeline.build_reports(spark, sf_dir)
    ts = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    row = pipeline.run_summary_row(reports, ts).collect()
    assert len(row) == 1
    r = row[0]
    assert r["abc_a"] + r["abc_b"] + r["abc_c"] > 0
    assert r["total_inventory_value"] > 0
    assert r["run_timestamp"] == dt.datetime(2026, 1, 1)


def test_bad_load_type_rejected(spark, sf_dir, tmp_path):
    with pytest.raises(ValueError, match="load_type"):
        pipeline.run_pipeline(spark, sf_dir, str(tmp_path), load_type="nope")
