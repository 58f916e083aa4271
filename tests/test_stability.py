"""Partitioning-invariance of the driver hash: the external harness may run
with a different core count / shuffle-partition setting than local tests, so
every registered query's ROUNDED output must be bit-identical across
partition layouts. Integer-cents money sums are invariant by construction;
this suite drives the remaining float-bearing aggregates (averages of logs,
ratios, recall fractions) through two very different shuffle widths and
requires identical results — the strongest local defense against an
environment-dependent hash flip.
"""

from __future__ import annotations

import pytest

from wsspark.queries import build_registry

# The float-heaviest registered queries: averaged logs (LM scores), global
# ratio KPIs, Pareto cumulative shares, ANN recall fractions, weighted
# averages. Money-only queries are covered by the exactsum property tests.
FLOAT_QUERIES = [
    "bigram_lm_scores",
    "revenue_concentration",
    "abc_analysis",
    "ann_recall_at_k",
    "repetition_stats",
    "brand_price_quantiles",
    "tfidf_top_terms",
    "weekly_cohort_retention",
]


@pytest.mark.parametrize("name", FLOAT_QUERIES)
def test_rounded_output_invariant_to_shuffle_partitioning(spark, sf_dir, name):
    # invariance matters for folded queries too (their pytest oracle hash
    # is computed with the same compare) — resolve from either table
    from wsspark.queries.llm import FOLDED_QUERIES

    lookup = {**build_registry(), **{q.name: q for q in FOLDED_QUERIES}}
    q = lookup[name]
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for parts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results.append(sorted(map(tuple, q.fn(spark, sf_dir).collect())))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert results[0] == results[1], (
        f"{name}: rounded output changed with shuffle partitioning — the "
        "driver hash would flip across environments"
    )
