"""Document fingerprinting: winnowing over rolling k-gram hashes
(Schleimer et al., "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD 2003 — public algorithm).

A document's fingerprint set is the per-window minimum of its k-gram hash
sequence. Two documents sharing content of length >= window+k-1 share at
least one fingerprint, so candidate retrieval is an equi-join on
(fingerprint) — no quadratic scan. Entirely native array expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kgram_hashes(text_col: str = "text", k: int = 5) -> Column:
    """xxhash64 of each k-word gram (rolling sequence preserved in order)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.when(
        n >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.transform(grams, lambda g: F.xxhash64(g))


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """doc_id -> sorted distinct fingerprint array (window-min selection)."""
    hashes = kgram_hashes(text_col, k)
    n = F.size(hashes)
    starts = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    mins = F.transform(starts, lambda i: F.array_min(F.slice(hashes, i + 1, window)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_sort(F.array_distinct(mins)).alias("fingerprints"),
    )


def fingerprint_candidates(fps: DataFrame) -> DataFrame:
    """Docs sharing >= 1 fingerprint, with the shared count — an equi-join on
    the exploded fingerprint, grouped back per pair."""
    ex = fps.select("doc_id", F.explode("fingerprints").alias("fp"))
    a = ex.alias("a")
    b = ex.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_fingerprints"))
    )
