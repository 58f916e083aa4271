"""Document fingerprinting: winnowing over rolling k-gram hashes
(Schleimer et al., "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD 2003 — public algorithm).

A document's fingerprint set is the per-window minimum of its k-gram hash
sequence. Two documents sharing content of length >= window+k-1 share at
least one fingerprint, so candidate retrieval is an equi-join on
(fingerprint) — no quadratic scan. Entirely native array expressions.

Gram hash = ``dedup.portable_hash64`` (60-bit md5 prefix): fingerprints are
the operator's OUTPUT, and the portable hash lets a DuckDB oracle recompute
the full winnowing selection value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wsspark.llmops.dedup import portable_hash64


def kgram_hashes(text_col: str = "text", k: int = 5) -> Column:
    """portable_hash64 of each k-word gram (rolling sequence, in order)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.when(
        n >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.transform(grams, lambda g: portable_hash64(g))


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """doc_id -> sorted distinct fingerprint array (window-min selection).

    NOT a per-row array-transform: slicing the k-gram hash array inside a
    ``transform`` lambda re-evaluates the whole hashing expression per window
    position (higher-order functions are CodegenFallback, and whole-stage
    codegen inlines the upstream projection into every reference site —
    measured ~40s for 500 docs vs ~1s here; an intermediate ``select`` does
    NOT protect you, fused projects are expression-substituted). Instead the
    hash sequence is exploded once (one evaluation per doc) and the sliding
    minimum is a rows-window ``min`` keyed by doc — one doc_id exchange that
    the following groupBy reuses, so the whole op costs a single shuffle of
    ~n_grams rows. Docs with NULL text drop out (they have no k-grams, hence
    no fingerprints).
    """
    from pyspark.sql import Window

    ex = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(kgram_hashes(text_col, k)).alias("pos", "h"),
    )
    sliding = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    per_doc = Window.partitionBy("doc_id")
    mins = ex.select(
        "doc_id",
        "pos",
        F.min("h").over(sliding).alias("m"),
        F.max("pos").over(per_doc).alias("_maxpos"),
    )
    # one min per window start: starts run 0..max(n-window, 0), matching the
    # slice-based formulation (short docs keep a single whole-array min).
    return (
        mins.filter(
            F.col("pos") <= F.greatest(F.col("_maxpos") - (window - 1), F.lit(0))
        )
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("m")).alias("fingerprints"))
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
