"""Exact radix-bisection order statistics: sorted-truth equivalence,
sign/tie/edge behavior, and the no-sort plan contract.
"""

from __future__ import annotations

import math
import random

import pytest

from wsspark.ops.exactkth import exact_group_quantiles, robust_outlier_stats


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


def test_hostile_group_keys_null_float_delimiter(spark):
    """Group identity rides the raw columns (null-safe joins, driver state
    keyed by collected Row tuples) — groups with NULL components, float
    group values (Spark CAST and Python str render '1e-07' differently),
    and values containing the old '\\x1f' delimiter must all stay distinct
    and resolve exact quantiles (the pre-fix string key desynchronized and
    raised KeyError or silently merged histograms)."""
    rows = [
        # multi-col group with NULL in one component, both orders
        ("a", None, 1.0), ("a", None, 3.0),
        (None, "a", 10.0), (None, "a", 30.0),
        # values containing the delimiter: ('x\x1fy', 'z') vs ('x', 'y\x1fz')
        ("x\x1fy", "z", 100.0), ("x", "y\x1fz", 200.0),
    ]
    df = spark.createDataFrame(rows, "g1 string, g2 string, v double")
    got = {
        (r.g1, r.g2): r.value
        for r in exact_group_quantiles(df, "v", (1.0,), ("g1", "g2")).collect()
    }
    assert got == {
        ("a", None): 3.0,
        (None, "a"): 30.0,
        ("x\x1fy", "z"): 100.0,
        ("x", "y\x1fz"): 200.0,
    }
    # float group keys: tiny magnitudes where repr() vs CAST diverge
    fdf = spark.createDataFrame(
        [(1e-07, 5.0), (1e-07, 7.0), (2.5e-08, 9.0)], "g double, v double"
    )
    fgot = {
        r.g: r.value
        for r in exact_group_quantiles(fdf, "v", (1.0,), ("g",)).collect()
    }
    assert fgot == {1e-07: 7.0, 2.5e-08: 9.0}


def test_max_group_paths_guard(spark):
    """groups x fractions above the documented bound raises eagerly instead
    of flooding the driver with per-pass histogram collects."""
    df = spark.createDataFrame(
        [(str(i), float(i)) for i in range(8)], "g string, v double"
    )
    with pytest.raises(ValueError, match="max_group_paths"):
        exact_group_quantiles(df, "v", (0.5, 0.9), ("g",), max_group_paths=15)
    # at the bound exactly: fine
    out = exact_group_quantiles(df, "v", (0.5, 0.9), ("g",), max_group_paths=16)
    assert out.count() == 16


def test_guard_fires_before_any_histogram_collect(spark, monkeypatch):
    """The cardinality guard must run BEFORE the fused pass-0 histogram
    collect — a post-hoc check would already have materialized up to
    groups x 65536 driver rows. Spy on DataFrame.collect: when the guard
    raises, the ONLY collect is the bounded group-column probe (columns
    == the group cols), never a histogram frame (_b/_c/_mn/_mx)."""
    df = spark.createDataFrame(
        [(str(i), float(i)) for i in range(32)], "g string, v double"
    )
    # patch the CONCRETE class (pyspark 4 routes pyspark.sql.DataFrame to a
    # classic/connect subclass that overrides collect)
    cls = type(df)
    calls: list[list[str]] = []
    orig = cls.collect

    def spy(self):
        calls.append(list(self.columns))
        return orig(self)

    monkeypatch.setattr(cls, "collect", spy)
    with pytest.raises(ValueError, match="max_group_paths"):
        exact_group_quantiles(df, "v", (0.5,), ("g",), max_group_paths=4)
    assert calls == [["g"]], calls


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


def test_robust_outlier_stats_planted(spark):
    """Exact MAD fence on a planted distribution: 97 inliers near 10.0
    plus 3 far points — median/MAD come from the bulk and exactly the 3
    planted rows breach z=3."""
    rows = [("g", 10.0 + (i % 5) * 0.01) for i in range(97)]
    rows += [("g", 500.0), ("g", -400.0), ("g", 999.99)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = robust_outlier_stats(df, "v", ("grp",), z=3.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_rows == 100 and r.n_outliers == 3
    # sorted rank 50 of the bulk (20/20/20/19/18 at 10.00..10.04 plus the
    # three planted extremes) is 10.02; median |dev| is 0.01
    assert r.median == 10.02 and r.mad == 0.01


def test_robust_outlier_stats_zero_mad(spark):
    """Constant column: MAD = 0, every unequal value is an outlier,
    equal values are not (dev > 0 fence)."""
    rows = [("g", 5.0)] * 50 + [("g", 5.01)]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = robust_outlier_stats(df, "v", ("grp",)).collect()[0]
    assert r.mad == 0.0 and r.n_outliers == 1


def test_robust_outlier_stats_global_no_group(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 12)] + [(1000.0,)], "v double"
    )
    r = robust_outlier_stats(df, "v").collect()[0]
    # 12 values 1..11 + 1000: type-1 median = 6, devs sorted -> MAD = 3
    assert r.median == 6.0 and r.mad == 3.0 and r.n_outliers == 1


def test_level_skipping_extremes_match_sorted_truth(spark):
    """Shapes that stress the min/max level-skip logic: a narrow band far
    from zero (big jumps), heavy ties (all-ties early resolution), and a
    full-range spread (no skips possible — all four levels walked)."""
    import random

    random.seed(99)
    rows = []
    # narrow band: values in [10_000.00, 10_000.99] -> top ~44 bits common
    rows += [("band", 10_000.0 + random.randrange(100) / 100) for _ in range(500)]
    # ties: only 3 distinct values
    rows += [("ties", float(v)) for v in random.choices([1.0, 2.0, 3.0], k=300)]
    # full-range: huge positive/negative magnitudes (cents up to ~9e14)
    rows += [
        ("wide", random.uniform(-9e12, 9e12)) for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    fr = (0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    got = {
        (r.g, r.fraction): r.value
        for r in exact_group_quantiles(df, "v", fr, ("g",)).collect()
    }
    for g in ("band", "ties", "wide"):
        vals = sorted(round(v * 100) / 100 for gg, v in rows if gg == g)
        for f in fr:
            assert got[(g, f)] == pytest.approx(_type1(vals, f), abs=1e-9), (g, f)
