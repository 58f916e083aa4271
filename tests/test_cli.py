"""CLI entry point (python -m wsspark) — the reference's schedule-ready
runner analog (etl_pipeline/main.py:120-134)."""

from __future__ import annotations

import os

import pytest

from wsspark.__main__ import main


def test_cli_full_load_writes_all_reports(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "out")
    rc = main(["--load_type", "full", "--sf-dir", sf_dir, "--output-dir", out])
    assert rc == 0
    from wsspark.pipeline import REPORT_NAMES

    for name in REPORT_NAMES:
        assert os.path.isdir(os.path.join(out, name)), name
    assert "wrote abc_analysis" in capsys.readouterr().out


def test_cli_incremental_empty_early_exit(spark, sf_dir, tmp_path, capsys):
    """A watermark past all data early-exits like the reference
    (etl_pipeline/main.py:68-70): rc 0, nothing written."""
    out = str(tmp_path / "out_inc")
    rc = main(
        [
            "--load_type", "incremental",
            "--incremental-since", "2099-01-01 00:00:00",
            "--sf-dir", sf_dir,
            "--output-dir", out,
        ]
    )
    assert rc == 0
    assert "no new movements" in capsys.readouterr().out
    assert not os.path.isdir(out) or not os.listdir(out)


def test_cli_incremental_requires_watermark(tmp_path):
    with pytest.raises(SystemExit):
        main(["--load_type", "incremental", "--output-dir", str(tmp_path)])
