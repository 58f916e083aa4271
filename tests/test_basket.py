"""Market-basket frequent pairs: planted supports, lossless Apriori
prune, dedup of duplicate basket lines, and validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wsspark.io import read_table
from wsspark.ops.basket import frequent_pairs


def test_planted_supports_and_lift(spark):
    """(1,2) co-occur in 3 of 5 baskets, (1,3) in 2, item 9 appears once
    (pruned at L1). Duplicate lines in basket 10 must not inflate."""
    rows = [
        (10, 1), (10, 2), (10, 3), (10, 1),  # dup line for item 1
        (20, 1), (20, 2),
        (30, 1), (30, 2), (30, 3),
        (40, 1), (40, 9),
        (50, 4),
    ]
    df = spark.createDataFrame(rows, "basket long, item long")
    got = {
        (r.item_a, r.item_b): r
        for r in frequent_pairs(df, "basket", "item", min_support=2).collect()
    }
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    r = got[(1, 2)]
    assert (r.pair_support, r.support_a, r.support_b) == (3, 4, 3)
    assert r.lift == pytest.approx(3 * 5 / (4 * 3), abs=1e-6)
    assert got[(1, 3)].pair_support == 2
    assert got[(2, 3)].pair_support == 2


def test_apriori_prune_is_lossless(spark, sf_dir):
    """Support is anti-monotone, so pruning infrequent items before the
    pair join must not change the result — re-proved on the driver
    corpus against the unpruned quadratic join."""
    li = read_table(spark, sf_dir, "lineitem")
    pruned = {
        tuple(r)
        for r in frequent_pairs(li, "l_orderkey", "l_partkey", 3).collect()
    }
    items = li.select(
        F.col("l_orderkey").alias("b"), F.col("l_partkey").alias("i")
    ).distinct()
    a, bb = items.alias("a"), items.alias("b")
    raw = (
        a.join(bb, (F.col("a.b") == F.col("b.b")) & (F.col("a.i") < F.col("b.i")))
        .groupBy(F.col("a.i").alias("item_a"), F.col("b.i").alias("item_b"))
        .agg(F.count("*").alias("s"))
        .filter(F.col("s") >= 3)
    )
    want = {(r.item_a, r.item_b, r.s) for r in raw.collect()}
    assert {(p[0], p[1], p[2]) for p in pruned} == want
    assert want, "corpus produced no frequent pairs at support 3"


def test_min_support_validation(spark):
    df = spark.createDataFrame([(1, 1)], "basket long, item long")
    with pytest.raises(ValueError):
        frequent_pairs(df, "basket", "item", min_support=0)
