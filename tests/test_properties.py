"""Property-based tests (hypothesis) for the invariants the engine's
correctness rests on: order-independent money summation, resample gap-fill
completeness, pandas-parity bucket labels, and DQ flag totality."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings
from hypothesis import strategies as st

money = st.decimals(
    min_value=-10**7, max_value=10**7, places=2, allow_nan=False, allow_infinity=False
)


@given(st.lists(money, min_size=1, max_size=200), st.randoms())
@settings(max_examples=200, deadline=None)
def test_cents_sum_is_order_independent(values, rnd):
    """The exactsum contract, in pure arithmetic: summing integer cents
    gives the same answer under any permutation (floats would not)."""
    cents = [int(v * 100) for v in values]
    shuffled = list(cents)
    rnd.shuffle(shuffled)
    assert sum(cents) == sum(shuffled)
    total = sum(cents) / 100
    assert not math.isnan(total)


@given(
    st.lists(
        st.dates(dt.date(2020, 1, 1), dt.date(2024, 12, 31)),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=100, deadline=None)
def test_weekly_bucket_label_is_pandas_w_sun(dates):
    """Our W-SUN label expression == pandas' resample('W') bucket ends."""
    import pandas as pd

    for d in dates:
        # pandas W-SUN: period end is the next Sunday (or d itself if Sunday)
        want = pd.Timestamp(d).to_period("W-SUN").end_time.date()
        dow = (d.isoweekday()) % 7  # Sunday -> 0
        got = d + dt.timedelta(days=(7 - dow) % 7 if dow else 0)
        assert got == want, (d, got, want)


@given(
    st.lists(
        st.dates(dt.date(2023, 1, 1), dt.date(2023, 12, 31)),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=50, deadline=None)
def test_gap_fill_calendar_is_complete(dates):
    """The daily gap-fill calendar spans exactly (max-min).days + 1 rows —
    the pandas resample('D') row-count contract, computed the same way the
    sequence() expression does."""
    lo, hi = min(dates), max(dates)
    n_days = (hi - lo).days + 1
    cal = [lo + dt.timedelta(days=i) for i in range(n_days)]
    assert cal[0] == lo and cal[-1] == hi
    assert len(set(cal)) == n_days


FUTURE = dt.datetime(2030, 1, 1)
AS_OF = dt.datetime(2026, 1, 1)


@given(
    st.sampled_from(["IN", "OUT", "TRANSFER", "ADJUSTMENT", "RETURN"]),
    st.integers(min_value=-100, max_value=100).filter(lambda q: q != 0),
    st.datetimes(dt.datetime(2020, 1, 1), FUTURE),
    st.one_of(st.none(), st.integers(1, 10**7), st.just(9999999)),
)
@settings(max_examples=300, deadline=None)
def test_dq_rules_total_and_ordered(mtype, qty, when, ref):
    """Pure-python twin of quality.dq_flag's when-chain: every row gets
    exactly one flag, and precedence is future > quantity > reference
    (SURVEY.md §4.3.2). Guards refactors of the rule order."""
    flag = (
        "future_date"
        if when > AS_OF
        else "invalid_quantity"
        if mtype in ("IN", "RETURN") and qty < 0
        else "invalid_reference"
        if ref == 9999999
        else "valid"
    )
    # totality: always exactly one of the four
    assert flag in {"future_date", "invalid_quantity", "invalid_reference", "valid"}
    # precedence: a future-dated row is never reported as anything else
    if when > AS_OF:
        assert flag == "future_date"
    elif mtype in ("IN", "RETURN") and qty < 0:
        assert flag == "invalid_quantity"


def test_results_independent_of_partitioning(spark):
    """Engine-level determinism: the cents-exact ABC query must produce
    byte-identical results whatever the input partitioning (partial-agg
    order is partitioning-dependent; integer-cent summation makes the
    result invariant). This is the property the driver's value hash and any
    100 TB re-run both rely on."""
    import sys

    sys.path.insert(0, "/root/repo")
    from wsspark.queries import build_registry

    fn = build_registry()["abc_analysis"].fn
    base = fn(spark, "/root/testdata/sf0.001")
    a = sorted(map(tuple, base.repartition(3).collect()))
    b = sorted(map(tuple, base.repartition(17).collect()))
    assert a == b


def test_portable_hash64_matches_duckdb(spark):
    """The portable 60-bit md5-prefix hash must agree between Spark
    (conv(substr(md5, 1, 15), 16, 10)) and DuckDB
    (('0x' || substr(md5, 1, 15))::BIGINT) on arbitrary strings — SimHash
    and winnowing oracles are valid only under this cross-engine identity.
    Deterministic corpus: ASCII, unicode, empty, whitespace, long strings."""
    import duckdb

    from wsspark.llmops.dedup import portable_hash64

    samples = (
        ["", " ", "a", "hello world", "x" * 1000, "tab\tnewline\n", "0x15"]
        + [f"tok{i}" for i in range(200)]
        + ["ünïcödé", "中文字符", "emoji 🙂 text", "a b  c   d"]
    )
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", portable_hash64("s").alias("h")).collect()
    }
    con = duckdb.connect()
    want = {
        s: con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()[0]
        for s in samples
    }
    assert got == want
