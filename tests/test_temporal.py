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


def test_asof_join_carries_null_payload_and_row_atomicity(spark):
    """The matched right row must win even when its payload value is
    legitimately NULL (per-column carry would leak an older row's value),
    and multiple right columns must all come from that SAME row."""
    left = spark.createDataFrame(
        [(1, 10, ts("2024-01-01 10:00:00"))], ["lid", "k", "lts"]
    )
    right = spark.createDataFrame(
        [
            # older row: both values present
            (100, 10, ts("2024-01-01 08:00:00"), 5.0, "old"),
            # latest prior row: price is NULL, label present
            (101, 10, ts("2024-01-01 09:00:00"), None, "new"),
        ],
        ["rid", "k", "rts", "price", "label"],
    )
    out = temporal.asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_cols=("rid", "price", "label"), tiebreak="rid",
    ).collect()[0]
    assert out["rid"] == 101
    assert out["price"] is None  # NOT 5.0 from the older row
    assert out["label"] == "new"


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


def test_scd2_intervals_collapse_and_versions(spark):
    """Runs of unchanged values collapse into one version; intervals chain
    [from, to); the open version gets the high-date sentinel and
    is_current; null values compare null-safely."""
    obs = spark.createDataFrame(
        [
            # key 1: 10 -> 10 -> 20 -> 20 -> 10  => 3 versions
            (1, dt.date(2024, 1, 1), 10.0),
            (1, dt.date(2024, 1, 2), 10.0),
            (1, dt.date(2024, 1, 3), 20.0),
            (1, dt.date(2024, 1, 4), 20.0),
            (1, dt.date(2024, 1, 5), 10.0),
            # key 2: null -> null -> 5  => 2 versions (null run collapses)
            (2, dt.date(2024, 2, 1), None),
            (2, dt.date(2024, 2, 2), None),
            (2, dt.date(2024, 2, 3), 5.0),
        ],
        ["k", "d", "v"],
    )
    out = temporal.scd2_intervals(obs, key="k", ts="d", value_cols=("v",))
    rows = {(r["k"], r["version"]): r for r in out.collect()}
    assert len(rows) == 5
    sentinel = dt.date.fromisoformat(temporal.SCD2_OPEN_END)

    r11 = rows[(1, 1)]
    assert (r11["effective_from"], r11["effective_to"], r11["v"]) == (
        dt.date(2024, 1, 1), dt.date(2024, 1, 3), 10.0)
    assert not r11["is_current"]
    r13 = rows[(1, 3)]
    assert (r13["effective_from"], r13["effective_to"], r13["v"]) == (
        dt.date(2024, 1, 5), sentinel, 10.0)
    assert r13["is_current"]

    r21 = rows[(2, 1)]
    assert r21["v"] is None and r21["effective_to"] == dt.date(2024, 2, 3)
    r22 = rows[(2, 2)]
    assert r22["v"] == 5.0 and r22["is_current"]


def test_scd2_plan_single_exchange(spark):
    """Change-detect and interval-close windows share one (key, ts) sort:
    exactly one hash exchange in the whole plan."""
    obs = spark.range(1000).select(
        (F.col("id") % 37).alias("k"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("d"),
        (F.col("id") % 5).cast("double").alias("v"),
    )
    out = temporal.scd2_intervals(obs, key="k", ts="d", value_cols=("v",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


# ---------------------------------------------------------------------------
# Generative parity with pandas merge_asof — pins the full as-of semantics
# (backward inclusive, max-tiebreak on ts ties, same-row struct carry
# including legitimately-NULL payloads: the round-3 bug class).


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _asof_case(draw):
    key = st.integers(0, 2)
    tstamp = st.integers(0, 30)
    n_left = draw(st.integers(1, 12))
    n_right = draw(st.integers(0, 12))
    left = [(i, draw(key), draw(tstamp)) for i in range(n_left)]
    right = [
        (
            100 + i,
            draw(key),
            draw(tstamp),
            draw(st.one_of(st.none(), st.integers(-5, 5))),
        )
        for i in range(n_right)
    ]
    return left, right


@given(_asof_case())
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_property_merge_asof(spark, case):
    """asof_join == pandas merge_asof(direction='backward',
    allow_exact_matches=True) on randomized keys/timestamps, including
    duplicate timestamps on both sides, keys missing from either side, and
    NULL payload values in the matched right row (which must survive the
    carry, not fall through to an older row)."""
    import pandas as pd

    left, right = case
    ldf = spark.createDataFrame(left, "lid long, k long, ts long")
    rdf = spark.createDataFrame(right, "rid long, k long, rts long, val long")
    out = temporal.asof_join(
        ldf,
        rdf,
        on="k",
        left_ts="ts",
        right_ts="rts",
        right_cols=("rid", "val"),
        tiebreak="rid",
    )
    got = {r["lid"]: (r["rid"], r["val"]) for r in out.collect()}

    lp = pd.DataFrame(left, columns=["lid", "k", "lts"]).sort_values(
        ["lts", "lid"], kind="mergesort"
    )
    rp = (
        pd.DataFrame(right, columns=["rid", "k", "rts", "val"])
        .astype({"rid": "int64", "k": "int64", "rts": "int64", "val": "float64"})
        .sort_values(["rts", "rid"], kind="mergesort")
    )
    exp = pd.merge_asof(
        lp,
        rp,
        left_on="lts",
        right_on="rts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    want = {
        int(row.lid): (
            None if pd.isna(row.rid) else int(row.rid),
            None if pd.isna(row.val) else int(row.val),
        )
        for row in exp.itertuples(index=False)
    }
    assert got == want


@st.composite
def _range_case(draw):
    key = st.integers(0, 2)
    tus = st.integers(0, 20_000_000)  # 0-20s in microseconds
    n_left = draw(st.integers(1, 10))
    n_right = draw(st.integers(0, 15))
    w = draw(st.sampled_from([1, 2, 5]))
    left = [(i, draw(key), draw(tus)) for i in range(n_left)]
    right = [(draw(key), draw(tus)) for _ in range(n_right)]
    return left, right, w


@given(_range_case())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bucketed_range_count_matches_bruteforce(spark, case):
    """bucketed_range_count == the brute-force inequality count on
    randomized keys and SUB-SECOND timestamps: the two-bucket equi-join
    decomposition plus exact microsecond bounds must never over- or
    under-count at bucket edges, window boundaries (inclusive start,
    exclusive end), or for zero-match left rows."""
    left, right, w = case
    ldf = spark.createDataFrame(left, "lid long, k long, tus long").select(
        "lid", "k", F.timestamp_micros("tus").alias("ts")
    )
    rdf = spark.createDataFrame(right, "k long, tus long").select(
        "k", F.timestamp_micros("tus").alias("rts")
    )
    out = temporal.bucketed_range_count(
        ldf, rdf, on="k", left_ts="ts", right_ts="rts", window_seconds=w
    )
    got = {r["lid"]: r["n_in_window"] for r in out.collect()}
    wus = w * 1_000_000
    want = {
        lid: sum(1 for rk, rus in right if rk == k and lus - wus <= rus < lus)
        for lid, k, lus in left
    }
    assert got == want
