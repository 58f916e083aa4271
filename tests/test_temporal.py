"""Unit tests for the as-of join and bucketed range join operators
(wsspark.ops.temporal) on hand-built frames where the expected output is
enumerable, plus determinism/boundary edge cases the sf-scale oracle gate
can't isolate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from wsspark.llmops import textstats
from wsspark.ops import temporal


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_basic_and_no_prior(spark):
    left = spark.createDataFrame(
        [(1, 10, ts("2024-01-01 10:00:00")), (2, 10, ts("2024-01-01 08:00:00")),
         (3, 20, ts("2024-01-01 12:00:00"))],
        ["lid", "k", "lts"],
    )
    right = spark.createDataFrame(
        [(100, 10, ts("2024-01-01 09:00:00")), (101, 10, ts("2024-01-01 09:30:00")),
         (102, 30, ts("2024-01-01 00:00:00"))],
        ["rid", "k", "rts"],
    )
    out = temporal.asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_cols=("rid",), tiebreak="rid",
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    # lid=1 sees the later of the two prior rights; lid=2 predates all
    # rights; lid=3's key has no right rows at all.
    assert got == {1: 101, 2: None, 3: None}


def test_asof_join_inclusive_and_tiebreak(spark):
    t0 = ts("2024-01-01 09:00:00")
    left = spark.createDataFrame([(1, 10, t0)], ["lid", "k", "lts"])
    right = spark.createDataFrame(
        [(100, 10, t0), (101, 10, t0)], ["rid", "k", "rts"]
    )
    out = temporal.asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_cols=("rid",), tiebreak="rid",
    ).collect()
    # a right row AT the left timestamp matches (inclusive), and among
    # same-ts duplicates the max tiebreak wins deterministically
    assert out[0]["rid"] == 101


def test_bucketed_range_count_exact_boundaries(spark):
    p = ts("2024-01-01 10:00:00")
    left = spark.createDataFrame([(1, 10, p)], ["lid", "k", "lts"])
    right = spark.createDataFrame(
        [
            (10, p - dt.timedelta(hours=1)),            # == lower bound: in
            (10, p - dt.timedelta(minutes=30)),          # inside
            (10, p),                                     # == upper bound: out
            (10, p - dt.timedelta(hours=1, seconds=1)),  # before window: out
            (10, p - dt.timedelta(microseconds=1)),      # just inside
            (20, p - dt.timedelta(minutes=5)),           # wrong key: out
        ],
        ["k", "rts"],
    )
    out = temporal.bucketed_range_count(
        left, right, on="k", left_ts="lts", right_ts="rts",
        window_seconds=3600, count_alias="n",
    ).collect()
    assert out[0]["n"] == 3


def test_bucketed_range_count_keeps_zero_rows(spark):
    left = spark.createDataFrame(
        [(1, 10, ts("2024-01-01 10:00:00"))], ["lid", "k", "lts"]
    )
    right = spark.createDataFrame(
        [(99, ts("2024-01-01 09:30:00"))], ["k", "rts"]
    )
    out = temporal.bucketed_range_count(
        left, right, on="k", left_ts="lts", right_ts="rts",
        window_seconds=3600, count_alias="n",
    ).collect()
    assert len(out) == 1 and out[0]["n"] == 0


def test_repetition_stats_known_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b c"), (2, "x y")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in textstats.repetition_stats(docs).collect()}
    assert got[1]["n_words"] == 5 and got[1]["n_distinct_words"] == 3
    assert got[1]["top_word"] == "a" and got[1]["top_word_share"] == 0.6
    assert got[2]["top_word"] == "x"  # tie -> lexicographically first
    assert got[2]["unique_ratio"] == 1.0


def test_bigram_topk_counts_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "to be or not to be"), (2, "be"), (3, "")], ["doc_id", "text"]
    )
    rows = textstats.bigram_topk(docs, k=3).collect()
    assert [(r["bigram"], r["n"]) for r in rows] == [
        ("to be", 2), ("be or", 1), ("not to", 1),
    ]


def test_asof_plan_single_exchange(spark):
    """The as-of join must stay one hash exchange on the key (the union +
    window pattern) — no broadcast-nested-loop / cartesian fallback."""
    left = spark.range(100).select(
        F.col("id").alias("lid"), (F.col("id") % 10).alias("k"),
        F.timestamp_micros(F.col("id") * 1000000).alias("lts"),
    )
    right = spark.range(50).select(
        F.col("id").alias("rid"), (F.col("id") % 10).alias("k"),
        F.timestamp_micros(F.col("id") * 2000000).alias("rts"),
    )
    out = temporal.asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_cols=("rid",), tiebreak="rid",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_matches_pandas_merge_asof(spark):
    """The union + carry-forward as-of join must agree with pandas
    merge_asof (backward, inclusive) on randomized data."""
    import numpy as np
    import pandas as pd

    from wsspark.ops import temporal

    rng = np.random.default_rng(42)
    n_l, n_r = 200, 150
    left_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 10, n_l),
            "lts": pd.to_datetime(rng.integers(0, 10**6, n_l), unit="s"),
            "lid": np.arange(n_l),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 10, n_r),
            "rts": pd.to_datetime(rng.integers(0, 10**6, n_r), unit="s"),
            "rid": np.arange(n_r),
        }
    )
    # merge_asof needs unique (k, ts) on the right for a deterministic pick;
    # drop duplicate timestamps keeping the max rid (the tiebreak winner)
    right_pd = (
        right_pd.sort_values(["k", "rts", "rid"])
        .drop_duplicates(["k", "rts"], keep="last")
        .reset_index(drop=True)
    )

    got = (
        temporal.asof_join(
            spark.createDataFrame(left_pd),
            spark.createDataFrame(right_pd),
            on="k",
            left_ts="lts",
            right_ts="rts",
            right_cols=("rid",),
            tiebreak="rid",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left_pd.sort_values("lts"),
        right_pd.sort_values("rts"),
        left_on="lts",
        right_on="rts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("lid").reset_index(drop=True)
    g = got["rid"].astype("float64")
    w = want["rid_y" if "rid_y" in want.columns else "rid"].astype("float64")
    assert ((g == w) | (g.isna() & w.isna())).all()
