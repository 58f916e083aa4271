"""Exact radix-bisection order statistics: sorted-truth equivalence,
sign/tie/edge behavior, and the no-sort plan contract.
"""

from __future__ import annotations

import math
import random

import pytest

from wsspark.ops.exactkth import exact_group_quantiles


def _type1(sorted_vals, f):
    return sorted_vals[max(1, math.ceil(f * len(sorted_vals))) - 1]


def test_matches_sorted_truth_with_negatives_and_ties(spark):
    random.seed(11)
    rows = [("a", round(random.uniform(-300, 300), 2)) for _ in range(777)]
    rows += [("b", 5.0)] * 40 + [("b", -5.0)] * 40 + [("b", 0.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r.g, r.fraction): r.value
        for r in exact_group_quantiles(
            df, "v", (0.1, 0.25, 0.5, 0.9, 1.0), ("g",)
        ).collect()
    }
    for g in ("a", "b"):
        s = sorted(v for gg, v in rows if gg == g)
        for f in (0.1, 0.25, 0.5, 0.9, 1.0):
            assert got[(g, f)] == pytest.approx(_type1(s, f), abs=1e-9), (g, f)


def test_global_no_group_median(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    out = exact_group_quantiles(df, "v", (0.5,)).collect()
    assert len(out) == 1
    # type-1 at 0.5 over 1..100 -> rank 50
    assert out[0].value == 50.0 and out[0].fraction == 0.5


def test_single_row_and_extreme_fractions(spark):
    df = spark.createDataFrame([("x", 42.25)], "g string, v double")
    got = {
        r.fraction: r.value
        for r in exact_group_quantiles(df, "v", (0.01, 1.0), ("g",)).collect()
    }
    assert got == {0.01: 42.25, 1.0: 42.25}


def test_invalid_fraction_raises(spark):
    df = spark.createDataFrame([("x", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        exact_group_quantiles(df, "v", (0.0,), ("g",))
    with pytest.raises(ValueError):
        exact_group_quantiles(df, "v", (1.5,), ("g",))


def test_nulls_ignored_empty_frame_ok(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], "g string, v double"
    )
    out = exact_group_quantiles(df, "v", (1.0,), ("g",)).collect()
    assert out[0].value == 3.0
    empty = df.filter("v IS NULL AND g = 'zzz'")
    assert exact_group_quantiles(empty, "v", (0.5,), ("g",)).count() == 0


def test_no_sort_in_any_pass_plan(spark):
    """The operator's contract is NO global sort: none of its jobs may
    contain a Sort over the fact. The passes are collect()ed internally,
    so assert on the shape it builds: a histogram aggregation plan."""
    from pyspark.sql import functions as F

    from tests.test_plans import plan_of
    from wsspark.ops.exactkth import _MASK16

    df = spark.range(10000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") * 1.5).alias("v")
    )
    key = F.round(F.col("v") * 100).cast("long").bitwiseXOR(F.lit(-(1 << 63)))
    hist = df.select("g", key.alias("_k")).groupBy(
        "g", F.shiftrightunsigned("_k", 48).bitwiseAND(F.lit(_MASK16)).alias("_b")
    ).agg(F.count("*").alias("_c"))
    plan = plan_of(hist)
    assert "Sort" not in plan.split("\n\n")[0]
    assert "partial_count" in plan or "HashAggregate" in plan
