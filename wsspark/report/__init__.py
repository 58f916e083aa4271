"""Presentation layer (SURVEY.md §2.11): HTML report, charts, narrative.

Everything here consumes *collected* report frames (a few thousand rows max
— the aggregates from wsspark.pipeline), so it is plain driver-side Python
over ``df.toPandas()``; no Spark in the loop. Heavy optional deps degrade
gracefully, mirroring the reference's contract:

- matplotlib missing -> charts skipped, report still renders
  (reference: etl/load/report_generator.py:75-138 always has matplotlib).
- PDF engine missing -> HTML only (reference uses WeasyPrint,
  etl/load/report_generator.py:187-196).
- LLM client missing -> embedded error string, never an exception
  (reference: etl/model.py:40-42,95-97).
"""

from wsspark.report.narrative import generate_narrative_analysis
from wsspark.report.render import (
    create_charts,
    format_number,
    format_rupiah,
    generate_report,
    render_html,
)

__all__ = [
    "create_charts",
    "format_number",
    "format_rupiah",
    "generate_narrative_analysis",
    "generate_report",
    "render_html",
]
