"""Report layer: renders without optional deps, narrative degrades to an
error string (never raises), locale formatting matches the reference."""

from __future__ import annotations

import os

from wsspark import pipeline
from wsspark.report import (
    format_number,
    format_rupiah,
    generate_narrative_analysis,
    generate_report,
)


def test_locale_formatting():
    assert format_rupiah(1234567.89) == "1.234.567,89"
    assert format_number(3590.8) == "3.590,8"
    assert format_number(47365, 0) == "47.365"
    assert format_rupiah("not-a-number") == "not-a-number"


def test_narrative_degrades_without_client(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    out = generate_narrative_analysis({}, {}, total_items=0)
    assert out.startswith("<p><b>Error:")


def test_narrative_degrades_on_api_failure():
    class Boom:
        class chat:
            class completions:
                @staticmethod
                def create(**kw):
                    raise RuntimeError("api down")

    out = generate_narrative_analysis(
        {"total_dead_stock_items": 5}, {"total_inventory_value": 10.0},
        total_items=100, client=Boom(),
    )
    assert "narrative generation failed" in out


def test_generate_report_html(spark, sf_dir, tmp_path):
    reports = pipeline.build_reports(spark, sf_dir)
    artifacts = generate_report(reports, str(tmp_path / "out"), "2026-01-01")
    assert os.path.exists(artifacts["html"])
    html = open(artifacts["html"]).read()
    assert "Warehouse Analytics Report" in html
    assert "Total inventory value" in html
    assert "Error:" in html  # narrative degraded (no API key in CI)
