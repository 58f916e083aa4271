"""Skew utilities: salted aggregation and replicated join must agree exactly
with their naive counterparts (the skew machinery may never change results)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wsspark import skew


@pytest.fixture(scope="module")
def skewed(spark):
    """80/20-style: key 1 has 8k rows, keys 2..100 a handful each."""
    hot = spark.range(8000).select(
        F.lit(1).alias("k"), (F.col("id") % 7).alias("v")
    )
    cold = spark.range(2000).select(
        (F.col("id") % 99 + 2).alias("k"), (F.col("id") % 5).alias("v")
    )
    return hot.unionByName(cold)


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        r["k"]: (r["s"], r["n"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["n"], r["mx"])
        for r in skew.salted_agg(
            skewed, ["k"], {"s": "sum(v)", "n": "count(*)", "mx": "max(v)"}
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError, match="algebraic"):
        skew.salted_agg(skewed, ["k"], {"a": "avg(v)"})


def test_replicated_skew_join_matches_plain(spark, skewed):
    dim = spark.range(1, 101).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("k_name")
    )
    plain = (
        skewed.join(dim, "k")
        .groupBy("k", "k_name")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    salted = (
        skew.replicated_skew_join(skewed, dim, ["k"])
        .groupBy("k", "k_name")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))


def test_replicated_left_join_keeps_unmatched(spark):
    probe = spark.createDataFrame([(1, 10), (99, 5)], ["k", "v"])
    build = spark.createDataFrame([(1, "a")], ["k", "tag"])
    out = {
        r["k"]: r["tag"]
        for r in skew.replicated_skew_join(probe, build, ["k"], how="left").collect()
    }
    assert out == {1: "a", 99: None}


def test_salt_is_deterministic(spark, skewed):
    a = skew.salted_agg(skewed, ["k"], {"s": "sum(v)"}).collect()
    b = skew.salted_agg(skewed, ["k"], {"s": "sum(v)"}).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
