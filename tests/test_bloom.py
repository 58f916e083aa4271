"""Native-expression broadcast Bloom filter (llmops.bloom) and its
consumer, the bloom-backed cross-doc n-gram dup profile: membership
soundness (never a false negative), measured false positives when the
filter is deliberately undersized (the test is falsifiable), engine
portability of the bit arithmetic, and the no-extra-corpus-shuffle plan
contract."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from wsspark.io import read_table
from wsspark.llmops import bloom, textstats


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bloom_membership_sound_and_complete_enough(spark):
    """Every inserted key passes (no false negatives — a hard guarantee);
    with a well-sized filter, none of 200 disjoint non-members pass."""
    keys = spark.range(100).select(
        F.substring(F.md5(F.concat(F.lit("in:"), F.col("id"))), 1, 16).alias(
            "k"
        )
    )
    bitmap = bloom.bloom_bitmap(keys, "k", n_bits=1 << 16, k=4)
    probe = spark.range(300).select(
        F.when(
            F.col("id") < 100,
            F.substring(F.md5(F.concat(F.lit("in:"), F.col("id"))), 1, 16),
        )
        .otherwise(
            F.substring(F.md5(F.concat(F.lit("out:"), F.col("id"))), 1, 16)
        )
        .alias("k"),
        (F.col("id") < 100).alias("member"),
    )
    got = bloom.with_bloom_test(probe, "k", bitmap, n_bits=1 << 16, k=4)
    rows = got.collect()
    assert all(r.bloom_hit for r in rows if r.member)
    false_pos = sum(1 for r in rows if r.bloom_hit and not r.member)
    assert false_pos == 0  # 2^16 bits for 100 keys: fp ~ 1e-9 per probe


def test_bloom_ngram_profile_no_false_negatives(spark, sf_dir):
    """Per doc, the bloom profile's dup-window count is >= the exact
    profile's (no false negatives), and with the default 2^20-bit filter
    it is exactly equal on this corpus."""
    docs = read_table(spark, sf_dir, "documents")
    exact = {
        r.doc_id: (r.n_windows, r.n_dup_windows)
        for r in textstats.cross_doc_ngram_dup(docs).collect()
    }
    approx = {
        r.doc_id: (r.n_windows, r.n_dup_windows)
        for r in textstats.cross_doc_ngram_dup_bloom(docs).collect()
    }
    assert set(approx) == set(exact)
    for d, (nw, ndup) in exact.items():
        assert approx[d][0] == nw
        assert approx[d][1] >= ndup, d
    assert approx == exact  # sized filter: zero false positives here


def test_bloom_ngram_profile_undersized_filter_shows_fp(spark, sf_dir):
    """Falsifiability check: a deliberately tiny (256-bit) filter must
    produce false positives (else the soundness test above proves
    nothing), and still never a false negative."""
    docs = read_table(spark, sf_dir, "documents")
    exact = {
        r.doc_id: r.n_dup_windows
        for r in textstats.cross_doc_ngram_dup(docs).collect()
    }
    tiny = {
        r.doc_id: r.n_dup_windows
        for r in textstats.cross_doc_ngram_dup_bloom(
            docs, n_bits=256
        ).collect()
    }
    assert all(tiny[d] >= exact[d] for d in exact)
    assert sum(tiny[d] - exact[d] for d in exact) > 0


def test_bloom_profile_saves_the_join_back_shuffle(spark, sf_dir):
    """The bloom variant must not shuffle the gram-position stream for
    membership: its corpus-scale exchanges are the dup agg and the
    per-doc agg; the bitmap/pack exchanges move ~n_bits/63 rows. The
    exact variant's plan carries the gram join-back instead. Both stay
    UDF-free."""
    docs = read_table(spark, sf_dir, "documents")
    pb = _plan(textstats.cross_doc_ngram_dup_bloom(docs))
    assert "BatchEvalPython" not in pb
    # membership is a broadcast NLJ of the 1-row packed map, never a
    # shuffled join of the position stream against the dup keys
    assert "BroadcastNestedLoopJoin" in pb
    n_ex = len(re.findall(r"\(\d+\) Exchange", pb))
    assert n_ex <= 4, pb  # 2 corpus-scale + bitmap bit_or + 1-row pack


def test_bloom_bitmap_is_partition_invariant(spark):
    keys = spark.range(500).select(
        F.substring(F.md5(F.col("id").cast("string")), 1, 16).alias("k")
    )
    a = sorted(
        (r.word_idx, r.bits)
        for r in bloom.bloom_bitmap(keys, "k", n_bits=4096).collect()
    )
    b = sorted(
        (r.word_idx, r.bits)
        for r in bloom.bloom_bitmap(
            keys.repartition(11), "k", n_bits=4096
        ).collect()
    )
    assert a == b and len(a) > 0


def test_bloom_pruned_join_matches_plain_join(spark, sf_dir):
    """bloom_pruned_join must be row-identical to the plain join for
    inner and left_semi (no false negatives; fp rows die in the join),
    must actually prune (surviving probe rows ~ matches + fp, far below
    the full fact), and must reject semantics-changing join types."""
    import pytest

    from wsspark.llmops.bloom import bloom_pruned_join

    li = read_table(spark, sf_dir, "lineitem")
    # selective build side: ~2% of orders
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    build = orders.select("l_orderkey", "o_totalprice")

    plain = li.join(build, "l_orderkey").select(
        "l_orderkey", "l_linenumber", "o_totalprice"
    )
    pruned = bloom_pruned_join(li, build, "l_orderkey").select(
        "l_orderkey", "l_linenumber", "o_totalprice"
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, pruned.collect()))
    assert a == b and len(a) > 0

    semi_plain = sorted(
        r.l_orderkey
        for r in li.join(build, "l_orderkey", "left_semi")
        .select("l_orderkey")
        .collect()
    )
    semi_bloom = sorted(
        r.l_orderkey
        for r in bloom_pruned_join(li, build, "l_orderkey", how="left_semi")
        .select("l_orderkey")
        .collect()
    )
    assert semi_plain == semi_bloom

    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_pruned_join(li, build, "l_orderkey", how="left")


def test_bloom_pruned_join_prunes_before_the_shuffle(spark, sf_dir):
    """The plan must show the bloom membership test on the probe side
    BELOW the join (broadcast 1-row packed map, expression-only filter),
    and the survivor count must track the true match rate, not the fact
    size — that is the shuffled-row reduction."""
    from wsspark.llmops.bloom import bloom_bitmap, with_bloom_test

    li = read_table(spark, sf_dir, "lineitem")
    keys = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(
            F.substring(
                F.md5(F.col("o_orderkey").cast("string")), 1, 16
            ).alias("_bk")
        )
    )
    bitmap = bloom_bitmap(keys, "_bk")
    probed = with_bloom_test(
        li.withColumn(
            "_bk",
            F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 16),
        ),
        "_bk",
        bitmap,
    )
    n_total = li.count()
    n_pass = probed.filter("bloom_hit").count()
    n_true = li.join(
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    ).count()
    assert n_true <= n_pass  # no false negatives
    # fp head-room: survivors are matches + a small fp fraction of the rest
    assert n_pass <= n_true + max(50, int(0.01 * n_total)), (
        n_total, n_pass, n_true,
    )
    assert n_pass < n_total * 0.5  # it genuinely pruned on this workload
    plan = _plan(probed)
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row packed map


def test_bloom_pruned_join_edge_cases(spark):
    """Constructed edges: an EMPTY build side yields an empty join (the
    empty bitmap rejects every probe row — and even if it passed rows,
    the join drops them); NULL probe keys behave as in a plain inner join
    (dropped); duplicate keys on both sides keep full join multiplicity
    (the bitmap is idempotent per key, pruning never dedups)."""
    from wsspark.llmops.bloom import bloom_pruned_join

    probe = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (None, "d"), (3, "e")],
        "k long, v string",
    )
    build = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (9, 90.0)], "k long, w double"
    )

    got = sorted(
        map(tuple, bloom_pruned_join(probe, build, "k").collect())
    )
    want = sorted(map(tuple, probe.join(build, "k").collect()))
    assert got == want
    # multiplicity: key 1 has 2 probe rows x 2 build rows = 4
    assert sum(1 for r in got if r[0] == 1) == 4

    empty_build = build.filter(F.lit(False))
    assert bloom_pruned_join(probe, empty_build, "k").count() == 0


def test_bloom_membership_xxhash64_path(spark):
    """The xxhash64 fast path gives the same hard no-false-negative
    guarantee on RAW (non-hex) keys of any type, with zero false
    positives at this sizing — and its 31-bit hash reduction keeps every
    probe inside ANSI long arithmetic (negative xxhash64 outputs
    included)."""
    keys = spark.range(100).select((F.col("id") * 7919 - 300000).alias("k"))
    bitmap = bloom.bloom_bitmap(
        keys, "k", n_bits=1 << 16, k=4, hash="xxhash64"
    )
    probe = spark.range(300).select(
        F.when(F.col("id") < 100, F.col("id") * 7919 - 300000)
        .otherwise(F.col("id") * 7919 + 9999991)
        .alias("k"),
        (F.col("id") < 100).alias("member"),
    )
    rows = bloom.with_bloom_test(
        probe, "k", bitmap, n_bits=1 << 16, k=4, hash="xxhash64"
    ).collect()
    assert all(r.bloom_hit for r in rows if r.member)
    assert sum(1 for r in rows if r.bloom_hit and not r.member) == 0


def test_bloom_pruned_join_rejects_mismatched_key_types(spark):
    """xxhash64 is type-sensitive (int 5 and bigint 5 hash differently),
    so coercible-but-different key types — which a plain join silently
    casts — would turn every true match into a false negative. The
    operator must fail loudly instead."""
    import pytest

    from wsspark.llmops.bloom import bloom_pruned_join

    probe = spark.createDataFrame([(1, "a")], "k int, v string")
    build = spark.createDataFrame([(1, 1.0)], "k long, w double")
    with pytest.raises(ValueError, match="identical key types"):
        bloom_pruned_join(probe, build, "k")
