"""wsspark — a PySpark-native warehouse analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference warehouse stock-management stack (see SURVEY.md): data-quality
filtering, inventory metrics (dead stock / turnover / days-on-hand), movement
trend resampling with gap-fill, ABC/Pareto revenue classification, weighted
average stock valuation, reorder-point reporting, transfer-pattern analysis,
warehouse IO pivots, snapshot/audit semantics — plus LLM-data-pipeline
extension operators (dedup, similarity search, text analysis) designed for
100 TB-scale inputs.

Everything is lazy DataFrame/Spark-SQL on Catalyst; no RDDs, no row-at-a-time
Python UDFs in hot paths.
"""

__version__ = "0.1.0"
