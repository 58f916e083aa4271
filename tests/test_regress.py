"""Grouped closed-form OLS: known-line recovery, min-points gate,
degenerate-x NULL slope, and the one-aggregation plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from wsspark.ops.regress import group_ols


def test_recovers_planted_lines(spark):
    """y = 250x + 1200 (group a, exact) and y = -40x + 90000 (group b):
    closed form recovers both exactly from integer points."""
    rows = [("a", x, 250 * x + 1200) for x in range(0, 24)]
    rows += [("b", x, -40 * x + 90000) for x in range(5, 17)]
    df = spark.createDataFrame(rows, "g string, x int, y long")
    got = {r.g: r for r in group_ols(df, "x", "y", ("g",)).collect()}
    assert got["a"].slope_cents == 250.0
    assert got["a"].intercept_cents == 1200.0
    assert got["a"].n_points == 24
    assert got["b"].slope_cents == -40.0
    assert got["b"].intercept_cents == 90000.0


def test_noise_symmetric_around_line_cancels(spark):
    """+d/-d residuals at symmetric x positions leave the OLS line
    unchanged — the closed form sees the same sufficient statistics."""
    base = [("g", x, 10 * x + 7) for x in range(1, 11)]
    noisy = [
        ("g", x, y + (50 if x in (2, 9) else 0) - (50 if x in (3, 8) else 0))
        for g, x, y in base
    ]
    df = spark.createDataFrame(noisy, "g string, x int, y long")
    r = group_ols(df, "x", "y", ("g",)).collect()[0]
    # residuals +50@2, -50@3, -50@8, +50@9: sum 0 and sum(x*res) = 0
    assert r.slope_cents == 10.0 and r.intercept_cents == 7.0


def test_min_points_gate_and_degenerate_x(spark):
    df = spark.createDataFrame(
        [("tiny", 1, 5), ("tiny", 2, 6),
         ("flat", 4, 10), ("flat", 4, 20), ("flat", 4, 30)],
        "g string, x int, y long",
    )
    got = {r.g: r for r in group_ols(df, "x", "y", ("g",)).collect()}
    assert "tiny" not in got  # 2 points < min_points
    assert got["flat"].slope_cents is None  # zero x-variance


def test_single_aggregation_plan(spark):
    from tests.test_plans import plan_of

    df = spark.range(1000).select(
        (F.col("id") % 5).alias("g"),
        (F.col("id") % 50).alias("x"),
        (F.col("id") * 3).alias("y"),
    )
    plan = plan_of(group_ols(df, "x", "y", ("g",)))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree  # one shuffle: the groupBy
    assert "BatchEvalPython" not in plan


def test_streaming_trend_equals_batch_and_replay_noop(spark, sf_dir, tmp_path):
    """Sufficient statistics are a monoid: merging per-batch stats
    equals the batch fit over all rows — exact equality. Sums are not
    idempotent, so replay safety rides the batch-id tag: re-calling
    with a seen (or older) batch_id must be a no-op."""
    from wsspark.io import read_table
    from wsspark.ops.regress import StreamingGroupTrend, group_ols
    from wsspark.queries import exactsum as ex

    li = read_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 7).alias("g"),
        (F.month("l_shipdate")).alias("x"),
        ex.cents(F.col("l_extendedprice")).alias("y"),
    )
    state = str(tmp_path / "trend_state")
    sink = StreamingGroupTrend(state, "x", "y", ["g"])
    batches = [li.filter(F.col("g") % 2 == i % 2) for i in range(2)]
    for i, b in enumerate(batches):
        sink(b, i)
    want = sorted(map(tuple, group_ols(li, "x", "y", ("g",)).collect()))
    got = sorted(map(tuple, sink.fit(spark).collect()))
    assert got == want

    sink(batches[1], 1)  # exact replay
    sink(batches[0], 0)  # older-batch replay
    assert sorted(map(tuple, sink.fit(spark).collect())) == want
    # state is group-sized
    from wsspark.statestore import AtomicStateStore

    assert AtomicStateStore(state).read(spark).count() == 7


def test_group_corr_planted_correlations(spark):
    """Exact +1, exact -1, and independent pairs; NULL rows excluded
    listwise; zero-variance pair -> NULL corr."""
    import pytest as _pytest

    from wsspark.ops.regress import group_corr

    rows = []
    for i in range(1, 41):
        rows.append(("g", float(i), float(2 * i), float(-3 * i), 7.0))
    rows.append(("g", None, 1.0, 1.0, 1.0))  # listwise-dropped
    df = spark.createDataFrame(rows, "g string, a double, b double, c double, d double")
    out = {
        (r.col_x, r.col_y): r
        for r in group_corr(
            df, {"a": 100, "b": 100, "c": 100, "d": 100}, ("g",)
        ).collect()
    }
    assert out[("a", "b")].corr == 1.0
    assert out[("a", "c")].corr == -1.0
    assert out[("b", "c")].corr == -1.0
    assert out[("a", "d")].corr is None  # d constant -> zero variance
    assert out[("a", "b")].n_rows == 40  # null row excluded everywhere


def test_group_corr_overflow_validation(spark):
    import pytest as _pytest

    from wsspark.ops.regress import group_corr

    df = spark.createDataFrame(
        [(2.0e9, 2.0e9), (1.0, 2.0)], "a double, b double"
    )
    with _pytest.raises(ValueError, match="overflow"):
        group_corr(df, {"a": 100, "b": 100})
    # same data is fine at scale 1
    assert group_corr(df, {"a": 1, "b": 1}).count() == 1
    with _pytest.raises(ValueError, match="two columns"):
        group_corr(df, {"a": 1})
