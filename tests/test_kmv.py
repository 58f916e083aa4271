"""KMV sketch (wsspark/llmops/kmv.py): estimator accuracy against exact
distinct counts, the lossless-merge identity (streaming state == batch
sketch, bit-exact), replay idempotence, and partition invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wsspark.io import read_table
from wsspark.llmops import kmv


def _tokens(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "lang", "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )


def test_kmv_estimates_track_exact_distinct(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    got = {
        r.lang: (r.n_seen, r.est_distinct)
        for r in kmv.kmv_sketch(toks, ["lang"], "tok", k=64).collect()
    }
    exact = {
        r.lang: r.n
        for r in toks.groupBy("lang")
        .agg(F.countDistinct("tok").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for lang, n in exact.items():
        n_seen, est = got[lang]
        if n < 64:
            assert n_seen == n and est == float(n)  # exact below k
        else:
            assert n_seen == 64
            # k=64 -> ~12.7% standard error; the data is fixed, so this
            # bound is a stable regression pin, not a flaky tolerance
            assert abs(est - n) / n < 0.30, (lang, est, n)

    # determinism under a different layout
    again = {
        r.lang: (r.n_seen, r.est_distinct)
        for r in kmv.kmv_sketch(
            toks.repartition(13), ["lang"], "tok", k=64
        ).collect()
    }
    assert again == got

    with pytest.raises(ValueError, match="k must be"):
        kmv.kmv_sketch(toks, ["lang"], "tok", k=2)


def test_streaming_kmv_state_equals_batch_sketch(spark, sf_dir, tmp_path):
    """The algebraic identity that makes KMV streamable: merging
    per-batch bottom-ks equals the batch sketch over all rows — EXACT
    equality, not approximate. Replaying a batch is a no-op (min-k over
    a set is idempotent)."""
    toks = _tokens(spark, sf_dir)
    state = str(tmp_path / "kmv_state")
    sink = kmv.StreamingKmvSketch(state, ["lang"], "tok", k=32)

    batches = [
        toks.filter(F.col("doc_id") % 3 == i).drop("doc_id")
        for i in range(3)
    ]
    for i, b in enumerate(batches):
        sink(b, i)
    want = sorted(
        map(tuple, kmv.kmv_sketch(toks, ["lang"], "tok", k=32).collect())
    )
    got = sorted(map(tuple, sink.sketch(spark).collect()))
    assert got == want  # bit-exact: same n_seen, kth_hash, estimate

    sink(batches[1], 99)  # replay an already-merged batch
    assert sorted(map(tuple, sink.sketch(spark).collect())) == want
