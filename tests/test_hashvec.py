"""Feature-hashing vectorizer (wsspark/llmops/hashvec.py) + the
quality-weighted sampler (classifier.quality_weighted_sample).

The hashvec oracle is a full DuckDB twin over the driver documents table:
bucket = md5-prefix % dim and sign = 16th-hex-char parity are both
portable one-liners, the signed counts are integers, and the l2 norm is a
sqrt of the same integer in both engines — so even the normalized doubles
must match EXACTLY, no rounding tolerance.
"""

from __future__ import annotations

import duckdb
import math
import pytest
from pyspark.sql import functions as F

from wsspark.io import read_table
from wsspark.llmops import classifier as clf
from wsspark.llmops import hashvec as hv

DIM = 64

TWIN_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
    FROM read_parquet('{{path}}')
), hashed AS (
    SELECT doc_id,
           ('0x' || substr(md5(tok), 1, 15))::BIGINT % {DIM} AS bucket,
           CASE WHEN ('0x' || substr(md5(tok), 16, 1))::BIGINT % 2 = 1
                THEN 1 ELSE -1 END AS sgn
    FROM toks
), acc AS (
    SELECT doc_id, bucket, SUM(sgn) AS v
    FROM hashed GROUP BY doc_id, bucket
    HAVING SUM(sgn) <> 0
), nrm AS (
    SELECT doc_id, sqrt(SUM(v * v)) AS n FROM acc GROUP BY doc_id
)
SELECT acc.doc_id, bucket, v / n AS weight
FROM acc JOIN nrm USING (doc_id)
ORDER BY doc_id, bucket
"""


def test_sparse_entries_match_duckdb_exactly(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    got = sorted(
        (r.doc_id, r.bucket, r.weight)
        for r in hv.hashed_vector_entries(docs, dim=DIM).collect()
    )
    want = [
        (int(d), int(b), float(w))
        for d, b, w in duckdb.sql(
            TWIN_SQL.format(path=f"{sf_dir}/documents.parquet")
        ).fetchall()
    ]
    assert len(got) == len(want) > 0
    for (gd, gb, gw), (wd, wb, ww) in zip(got, want):
        assert (gd, gb) == (wd, wb)
        assert gw == ww  # bit-exact: integer counts, same sqrt, same div


def test_dense_form_is_unit_norm_and_matches_sparse(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(50)
    dense = {r.doc_id: list(r.vec) for r in hv.hashed_doc_vectors(docs, dim=DIM).collect()}
    sparse = hv.hashed_vector_entries(docs, dim=DIM).collect()
    assert all(len(v) == DIM for v in dense.values())
    for v in dense.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9
    for r in sparse:
        assert dense[r.doc_id][r.bucket] == r.weight
    # buckets absent from the sparse form are exact zeros
    nonzero = {(r.doc_id, r.bucket) for r in sparse}
    for d, v in dense.items():
        for b, x in enumerate(v):
            if (d, b) not in nonzero:
                assert x == 0.0


def test_vectors_feed_the_similarity_ladder(spark):
    """Identical text -> cosine exactly 1; token-overlap pair ranks above
    a disjoint pair — the train-free retrieval contract."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "the quick brown fox runs past the sleepy dog"),
            (4, "completely unrelated words about spark engines here"),
        ],
        "doc_id long, text string",
    )
    vecs = {r.doc_id: r.vec for r in hv.hashed_doc_vectors(docs, dim=256).collect()}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))  # unit vectors

    assert cos(vecs[1], vecs[2]) == pytest.approx(1.0, abs=1e-12)
    assert cos(vecs[1], vecs[3]) > cos(vecs[1], vecs[4]) + 0.2


def test_dim_validation_and_empty_text(spark):
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="dim"):
        hv.hashed_vector_entries(docs, dim=0)
    # split('', ' ') -> [''] -> one token, one bucket, |weight| = 1
    rows = hv.hashed_vector_entries(docs, dim=8).collect()
    assert len(rows) == 1 and abs(rows[0].weight) == 1.0


def test_quality_weighted_sample_semantics(spark, sf_dir):
    gate = dict(min_tokens=40, min_avg_token_len=4.4)
    docs = read_table(spark, sf_dir, "documents")
    model = clf.train_quality_classifier(docs, iters=60, **gate)
    feats = clf.with_quality_features(docs, **gate).localCheckpoint()
    n = feats.count()
    kept_sharp = clf.quality_weighted_sample(feats, model, temperature=0.25)
    kept_t1 = clf.quality_weighted_sample(feats, model, temperature=1.0)
    kept_flat = clf.quality_weighted_sample(feats, model, temperature=100.0)
    n_sharp, n_t1, n_flat = kept_sharp.count(), kept_t1.count(), kept_flat.count()
    # flattening monotonicity: p^(1/T) rises with T for p in (0,1)
    assert n_sharp <= n_t1 <= n_flat <= n
    assert n_flat >= 0.95 * n  # T=100: keep-prob ~ p^0.01 ~ 1
    # deterministic: same call, same rows; payload columns survive
    a = sorted(r.doc_id for r in kept_t1.collect())
    b = sorted(r.doc_id for r in clf.quality_weighted_sample(feats, model, 1.0).collect())
    assert a == b and "text" in kept_t1.columns
    # selection is quality-biased: mean score of kept > mean score of all
    probs = {r.doc_id: r.quality_prob for r in clf.score_logreg(feats, model).collect()}
    kept_ids = set(a)
    mean_kept = sum(probs[d] for d in kept_ids) / len(kept_ids)
    mean_all = sum(probs.values()) / len(probs)
    assert mean_kept > mean_all
    with pytest.raises(ValueError, match="temperature"):
        clf.quality_weighted_sample(feats, model, temperature=0.0)
    with pytest.raises(ValueError, match="feature columns"):
        clf.quality_weighted_sample(docs, model, temperature=1.0)
