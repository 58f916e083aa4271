"""Distributed logistic regression (wsspark/llmops/classifier.py).

Oracle: a from-scratch numpy implementation of the SAME full-batch GD
(standardize -> sigmoid -> mean-gradient -> fixed-step updates) must
reproduce every weight — the numpy-equality discipline llmops.pca uses.
Plus: convergence, partition invariance, the rule-gate distillation on
the driver documents table, and the plan contracts (training iteration =
one partial-aggregated scan; scoring = map-only, no exchange, no Python).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wsspark.io import read_table
from wsspark.llmops import classifier as clf


def _synthetic(spark, n=2000, seed=7):
    """Deterministic labeled frame: 3 features, linear-ish truth + noise."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 3))
    logits = 1.5 * x[:, 0] - 2.0 * x[:, 1] + 0.5 * x[:, 2] - 0.3
    y = (logits + rng.logistic(scale=0.5, size=n) > 0).astype(int)
    rows = [
        (float(a), float(b), float(c), int(lab))
        for (a, b, c), lab in zip(x, y)
    ]
    df = spark.createDataFrame(rows, "f1 double, f2 double, f3 double, label int")
    return df, x, y


def _numpy_gd(x, y, iters, lr, l2=0.0):
    mean = x.mean(axis=0)
    std = np.maximum(x.std(axis=0), 1e-12)
    z = (x - mean) / std
    za = np.hstack([np.ones((len(z), 1)), z])
    w = np.zeros(za.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(za @ w)))
        g = za.T @ (p - y) / len(y)
        g[1:] += l2 * w[1:]
        w -= lr * g
    return w, mean, std


def test_fit_matches_numpy_reference(spark):
    df, x, y = _synthetic(spark)
    model = clf.fit_logreg(df, ["f1", "f2", "f3"], "label", iters=40, lr=1.0)
    w_ref, mean_ref, std_ref = _numpy_gd(x, y.astype(float), iters=40, lr=1.0)
    np.testing.assert_allclose(model["weights"], w_ref, rtol=1e-6, atol=1e-9)
    got_m = np.array([model["moments"][c][0] for c in ("f1", "f2", "f3")])
    got_s = np.array([model["moments"][c][1] for c in ("f1", "f2", "f3")])
    np.testing.assert_allclose(got_m, mean_ref, rtol=1e-9)
    np.testing.assert_allclose(got_s, std_ref, rtol=1e-9)
    # l2 path too
    model2 = clf.fit_logreg(df, ["f1", "f2", "f3"], "label", iters=25, lr=0.7, l2=0.01)
    w_ref2, _, _ = _numpy_gd(x, y.astype(float), iters=25, lr=0.7, l2=0.01)
    np.testing.assert_allclose(model2["weights"], w_ref2, rtol=1e-6, atol=1e-9)


def test_converges_and_separates(spark):
    df, x, y = _synthetic(spark)
    model = clf.fit_logreg(df, ["f1", "f2", "f3"], "label", iters=80, lr=1.0)
    assert model["loss"] < 0.45 < np.log(2)  # well under the w=0 baseline
    scored = clf.score_logreg(df, model)
    acc = (
        scored.select(
            ((F.col("quality_prob") > 0.5).cast("int") == F.col("label"))
            .cast("int")
            .alias("hit")
        )
        .agg(F.avg("hit"))
        .collect()[0][0]
    )
    assert acc >= 0.85  # noisy-linear truth: LR should recover most of it
    # probabilities are probabilities
    mm = scored.agg(
        F.min("quality_prob"), F.max("quality_prob")
    ).collect()[0]
    assert 0.0 <= mm[0] and mm[1] <= 1.0


def test_partition_invariance(spark):
    df, _, _ = _synthetic(spark, n=1000)
    m1 = clf.fit_logreg(df.coalesce(1), ["f1", "f2", "f3"], "label", iters=30)
    m8 = clf.fit_logreg(df.repartition(8), ["f1", "f2", "f3"], "label", iters=30)
    np.testing.assert_allclose(m1["weights"], m8["weights"], rtol=1e-6, atol=1e-9)


def test_quality_distillation_on_documents(spark, sf_dir):
    """The default gate keeps ALL driver docs (median 56 tokens, all well
    inside the box), so tighten the teacher's thresholds to produce both
    classes — the distillation needs something to learn."""
    gate = dict(min_tokens=40, min_avg_token_len=4.4)
    docs = read_table(spark, sf_dir, "documents")
    model = clf.train_quality_classifier(docs, iters=120, lr=1.0, **gate)
    from wsspark.llmops.corpus import with_quality_reason

    flagged = with_quality_reason(docs, **gate).select(
        "doc_id",
        (F.col("filter_reason") == "KEEP").cast("int").alias("label"),
        F.log1p(F.col("n_tokens").cast("double")).alias("log_tokens"),
        F.col("stopword_ratio").cast("double").alias("stopword_ratio"),
        F.col("avg_token_len").cast("double").alias("avg_token_len"),
    )
    scored = clf.score_logreg(flagged, model)
    acc = (
        scored.select(
            ((F.col("quality_prob") > 0.5).cast("int") == F.col("label"))
            .cast("int")
            .alias("hit")
        )
        .agg(F.avg("hit"))
        .collect()[0][0]
    )
    # a smooth LR can't reproduce a hard box rule exactly; it must get close
    assert acc >= 0.85
    # the score RANKS quality: mean prob of KEEP docs clearly above dropped
    means = (
        scored.groupBy("label").agg(F.avg("quality_prob").alias("p")).collect()
    )
    by_label = {r["label"]: r["p"] for r in means}
    assert by_label[1] > by_label[0] + 0.2


def test_plan_contracts(spark):
    """Scoring is map-only native codegen: no exchange, no Python eval.
    The training projection is a plain scan + project (the loop itself
    aggregates the cached frame)."""
    df, _, _ = _synthetic(spark, n=200)
    model = clf.fit_logreg(df, ["f1", "f2", "f3"], "label", iters=2)
    plan = (
        clf.score_logreg(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_validation_errors(spark):
    df, _, _ = _synthetic(spark, n=50)
    with pytest.raises(ValueError, match="feature"):
        clf.fit_logreg(df, [], "label")
    with pytest.raises(ValueError, match="empty"):
        clf.fit_logreg(df.filter(F.lit(False)), ["f1"], "label")


def test_pr_curve_matches_sklearn_style_truth(spark):
    """Exact binned PR sweep vs a driver-side replay on planted scores:
    every threshold row's tp/fp/fn and ratios must match the definition."""
    import random

    from pyspark.sql import functions as F  # noqa: F401

    from wsspark.llmops.classifier import pr_curve

    random.seed(5)
    rows = [
        (random.random(), 1 if random.random() < 0.4 else 0)
        for _ in range(500)
    ] + [(0.0, 0), (1.0, 1), (0.999999, 0)]  # exact edges incl clamp
    df = spark.createDataFrame(rows, "score double, label int")
    n_bins = 20
    got = {r.threshold: r for r in pr_curve(df, n_bins=n_bins).collect()}
    assert len(got) == n_bins
    for b in range(n_bins):
        t = round(b / n_bins, 6)
        tp = sum(1 for s, l in rows if s >= b / n_bins and l == 1)
        fp = sum(1 for s, l in rows if s >= b / n_bins and l == 0)
        fn = sum(1 for s, l in rows if s < b / n_bins and l == 1)
        r = got[t]
        assert (r.tp, r.fp, r.fn) == (tp, fp, fn), t
        if tp + fp:
            assert r.precision == round(tp / (tp + fp), 6)
        assert r.recall == round(tp / (tp + fn), 6)


def test_pr_curve_edges_and_nulls(spark):
    from wsspark.llmops.classifier import pr_curve

    # all-negative labels: recall is NULL everywhere, fp counts real
    df = spark.createDataFrame(
        [(0.3, 0), (0.9, 0), (None, 1), (0.5, None)], "score double, label int"
    )
    rows = pr_curve(df, n_bins=4).collect()
    assert len(rows) == 4
    assert all(r.recall is None for r in rows)
    assert rows[0].n_predicted == 2  # null score/label rows excluded
    # empty threshold rows exist and are well-defined
    top = [r for r in rows if r.threshold == 0.75][0]
    assert top.tp == 0 and top.fp == 1 and top.precision == 0.0
    import pytest

    with pytest.raises(ValueError):
        pr_curve(df, n_bins=0)


def test_auc_exact_with_ties_and_edges(spark):
    """Tie-aware AUC vs the driver-side definition (pairwise compare)."""
    import random

    from wsspark.llmops.classifier import auc

    random.seed(13)
    rows = [
        (round(random.random(), 1), 1 if random.random() < 0.3 else 0)
        for _ in range(400)
    ]  # 1dp scores -> heavy ties
    df = spark.createDataFrame(rows, "score double, label int")
    r = auc(df).collect()[0]
    pos = [s for s, l in rows if l == 1]
    neg = [s for s, l in rows if l == 0]
    u = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    assert r.n_pos == len(pos) and r.n_neg == len(neg)
    assert r.auc == round(u / (len(pos) * len(neg)), 6)
    # perfect separation -> 1.0; inverted -> 0.0; one-class -> NULL
    perf = spark.createDataFrame([(0.9, 1), (0.8, 1), (0.1, 0)], "score double, label int")
    assert auc(perf).collect()[0].auc == 1.0
    inv = spark.createDataFrame([(0.1, 1), (0.9, 0)], "score double, label int")
    assert auc(inv).collect()[0].auc == 0.0
    onecls = spark.createDataFrame([(0.5, 1), (0.7, 1)], "score double, label int")
    assert auc(onecls).collect()[0].auc is None


def test_label_agreement_matches_textbook_kappa(spark):
    """Hand-computed 2x2 case: po=0.7, pe=0.5 -> kappa=0.4 (the classic
    example shape), exact."""
    from wsspark.llmops.classifier import label_agreement

    rows = (
        [("y", "y")] * 40 + [("n", "n")] * 30
        + [("y", "n")] * 20 + [("n", "y")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = label_agreement(df, "a", "b").collect()[0]
    assert r.n == 100 and r.agree == 70
    assert r.po == 0.7
    # marginals: a: y=60,n=40; b: y=50,n=50 -> pe = .6*.5+.4*.5 = .5
    assert r.pe == 0.5
    assert r.kappa == round((0.7 - 0.5) / 0.5, 6)


def test_label_agreement_edges(spark):
    import pytest

    from wsspark.llmops.classifier import label_agreement

    # perfect agreement across 3 classes
    df = spark.createDataFrame(
        [(str(i % 3), str(i % 3)) for i in range(90)], "a string, b string"
    )
    r = label_agreement(df, "a", "b").collect()[0]
    assert r.kappa == 1.0 and r.po == 1.0
    # single shared class: pe == 1 -> kappa NULL (vacuous, not perfect)
    one = spark.createDataFrame([("x", "x")] * 10, "a string, b string")
    assert label_agreement(one, "a", "b").collect()[0].kappa is None
    # NULLs excluded; int labels cast fine
    mixed = spark.createDataFrame(
        [(1, 1), (2, None), (None, 2), (2, 2)], "a int, b int"
    )
    r = label_agreement(mixed, "a", "b").collect()[0]
    assert r.n == 2 and r.agree == 2
    # id-like columns raise eagerly with a bounded transfer
    ids = spark.createDataFrame(
        [(str(i), str(i + 1)) for i in range(50)], "a string, b string"
    )
    with pytest.raises(ValueError, match="id-like"):
        label_agreement(ids, "a", "b", max_cells=20)
    # empty input: honest zero row
    r = label_agreement(ids.filter("false"), "a", "b").collect()[0]
    assert r.n == 0 and r.kappa is None
