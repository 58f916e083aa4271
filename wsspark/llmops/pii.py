"""PII detection / redaction over text columns — a standard pre-training
curation gate (emails, phone numbers, IP addresses, SSN-shaped strings).

Patterns are RE2-compatible (no lookarounds) so the exact same regex runs
in Spark's JVM regexp engine and in an external SQL oracle. Everything is
native ``regexp_extract_all`` / ``regexp_replace`` — per-byte scan cost in
whole-stage codegen, no Python in the path. A production pipeline swaps in
NER-model scoring via ``mapInPandas`` behind the same column contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> (pattern, redaction token). Order matters for redaction: the
# more-specific SSN pattern must run before the phone pattern.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def pii_counts(text_col: str = "text") -> list[Column]:
    """One match-count column per PII pattern (``n_<name>``)."""
    return [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def pii_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII match counts + an ``has_pii`` gate flag."""
    counts = pii_counts(text_col)
    out = docs.select("doc_id", *counts)
    total = sum((F.col(f"n_{name}") for name, _, _ in PII_PATTERNS[1:]),
                F.col(f"n_{PII_PATTERNS[0][0]}"))
    return out.withColumn("has_pii", total > 0)


def redact_pii(docs: DataFrame, text_col: str = "text",
               out_col: str = "redacted_text") -> DataFrame:
    """Replace every PII match with its type token (chained
    ``regexp_replace`` — still one codegen projection)."""
    col: Column = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        col = F.regexp_replace(col, pat, token)
    return docs.withColumn(out_col, col)


def pii_summary(docs: DataFrame, text_col: str = "text",
                group_col: str = "source") -> DataFrame:
    """Per-``group_col`` PII prevalence: docs scanned, docs with any PII,
    and total matches per pattern. Map-side combinable aggregation over the
    flag projection — one shuffle at group cardinality."""
    flags = docs.select(group_col, *pii_counts(text_col)).withColumn(
        "has_pii",
        sum(
            (F.col(f"n_{name}") for name, _, _ in PII_PATTERNS[1:]),
            F.col(f"n_{PII_PATTERNS[0][0]}"),
        )
        > 0,
    )
    aggs = [
        F.sum(f"n_{name}").cast("long").alias(f"total_{name}")
        for name, _, _ in PII_PATTERNS
    ]
    return flags.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("has_pii"), 1).otherwise(0)).cast("long").alias(
            "n_docs_with_pii"
        ),
        *aggs,
    )
