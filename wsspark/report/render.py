"""HTML report + charts over the pipeline's report outputs.

The template mirrors the reference's embedded Jinja report
(etl/load/report_generator.py:203-281): KPI summary lists, top-10 transfer
patterns table, chart images, narrative section. Locale formatting follows
the reference's format_rupiah/format_number (1.234.567,89 style,
etl/load/report_generator.py:50-66).
"""

from __future__ import annotations

import os
from typing import Mapping

from jinja2 import Environment

from wsspark.report.narrative import generate_narrative_analysis

_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>Warehouse Analytics Report</title>
<style>
 body { font-family: sans-serif; margin: 2em; color: #222; }
 h1 { border-bottom: 2px solid #444; }
 ul.kpi li { margin: 0.3em 0; }
 table { border-collapse: collapse; }
 th, td { border: 1px solid #999; padding: 4px 10px; text-align: right; }
 th { background: #eee; }
 .charts img { max-width: 45%; margin: 0.5em; }
</style>
</head>
<body>
<h1>Warehouse Analytics Report</h1>
<p>Run: {{ run_timestamp }}</p>

<h2>Inventory KPIs</h2>
<ul class="kpi">
 <li>Dead stock items: <b>{{ inventory_summary.total_dead_stock_items | format_number(0) }}</b></li>
 <li>Stock turnover ratio: <b>{{ inventory_summary.stock_turnover_ratio | format_number }}</b></li>
 <li>Days of inventory on hand: <b>{{ inventory_summary.days_of_inventory_on_hand | format_number }}</b></li>
</ul>

<h2>Financial KPIs</h2>
<ul class="kpi">
 <li>Total inventory value: <b>Rp {{ financial_summary.total_inventory_value | format_rupiah }}</b></li>
 <li>ABC classes: A={{ abc_counts.A }}, B={{ abc_counts.B }}, C={{ abc_counts.C }}</li>
</ul>

{% if transfer_rows %}
<h2>Top transfer patterns</h2>
<table>
 <tr><th>From</th><th>To</th><th>Transfers</th><th>Total qty</th></tr>
 {% for r in transfer_rows %}
 <tr><td>{{ r.from_warehouse_id }}</td><td>{{ r.to_warehouse_id }}</td>
     <td>{{ r.total_transfers }}</td><td>{{ r.total_qty | format_number(0) }}</td></tr>
 {% endfor %}
</table>
{% endif %}

{% if chart_paths %}
<h2>Charts</h2>
<div class="charts">
 {% for p in chart_paths %}<img src="{{ p }}" alt="chart">{% endfor %}
</div>
{% endif %}

<h2>Analysis</h2>
{{ narrative }}
</body>
</html>
"""


def format_rupiah(value) -> str:
    """1234567.89 -> '1.234.567,89' (etl/load/report_generator.py:50-57)."""
    try:
        s = f"{float(value):,.2f}"
        return s.replace(",", "X").replace(".", ",").replace("X", ".")
    except (ValueError, TypeError):
        return str(value)


def format_number(value, precision: int = 1) -> str:
    """3590.8 -> '3.590,8' (etl/load/report_generator.py:59-66)."""
    try:
        s = f"{float(value):,.{precision}f}"
        return s.replace(",", "X").replace(".", ",").replace("X", ".")
    except (ValueError, TypeError):
        return str(value)


def create_charts(reports: Mapping, charts_dir: str) -> list[str]:
    """The reference's 4 matplotlib charts (etl/load/report_generator.py:
    75-138). Skipped cleanly when matplotlib isn't installed — the report
    renders without images."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return []

    os.makedirs(charts_dir, exist_ok=True)
    paths: list[str] = []

    monthly = reports["monthly_trends"].toPandas()
    fig, ax = plt.subplots()
    ax.plot(monthly.iloc[:, 0], monthly.iloc[:, 1], marker="o")
    ax.set_title("Monthly movement trend")
    p = os.path.join(charts_dir, "monthly_trend.png")
    fig.savefig(p)
    plt.close(fig)
    paths.append(p)

    abc = reports["abc_analysis"].groupBy("abc_class").count().toPandas()
    fig, ax = plt.subplots()
    ax.pie(abc["count"], labels=abc["abc_class"], autopct="%1.1f%%")
    ax.set_title("ABC distribution")
    p = os.path.join(charts_dir, "abc_pie.png")
    fig.savefig(p)
    plt.close(fig)
    paths.append(p)

    top10 = (
        reports["stock_value_report"]
        .orderBy("stock_value", ascending=False)
        .limit(10)
        .toPandas()
    )
    fig, ax = plt.subplots()
    ax.barh(top10["product_id"].astype(str), top10["stock_value"])
    ax.set_title("Top-10 stock value")
    p = os.path.join(charts_dir, "top10_value.png")
    fig.savefig(p)
    plt.close(fig)
    paths.append(p)
    return paths


def render_html(
    reports: Mapping,
    run_timestamp: str,
    chart_paths: list[str] | None = None,
    narrative: str | None = None,
) -> str:
    """Render the report HTML from lazily-defined report frames; only small
    aggregates are collected."""
    env = Environment()
    env.filters["format_rupiah"] = format_rupiah
    env.filters["format_number"] = format_number

    inv = reports["inventory_summary"].collect()[0].asDict()
    fin_row = reports["financial_summary"].collect()[0]
    fin = fin_row.asDict()
    abc_counts = fin_row["abc_summary"].asDict()
    transfers = [
        r.asDict() for r in reports["transfer_patterns"].limit(10).collect()
    ]

    if narrative is None:
        narrative = generate_narrative_analysis(
            inv, fin, total_items=reports["dead_stock_report"].count()
        )

    return env.from_string(_TEMPLATE).render(
        run_timestamp=run_timestamp,
        inventory_summary=inv,
        financial_summary=fin,
        abc_counts=abc_counts,
        transfer_rows=transfers,
        chart_paths=chart_paths or [],
        narrative=narrative,
    )


def generate_report(
    reports: Mapping, output_dir: str, run_timestamp: str
) -> dict[str, str]:
    """Charts -> HTML -> (PDF if an engine exists). Returns artifact paths."""
    os.makedirs(output_dir, exist_ok=True)
    charts = create_charts(reports, os.path.join(output_dir, "charts"))
    html = render_html(reports, run_timestamp, chart_paths=charts)
    html_path = os.path.join(output_dir, "report.html")
    with open(html_path, "w") as f:
        f.write(html)
    out = {"html": html_path}

    try:  # PDF engine optional (reference uses WeasyPrint)
        from weasyprint import HTML  # type: ignore

        pdf_path = os.path.join(output_dir, "report.pdf")
        HTML(string=html).write_pdf(pdf_path)
        out["pdf"] = pdf_path
    except ImportError:
        pass
    return out
