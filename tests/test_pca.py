"""Distributed PCA (wsspark/llmops/pca.py): the Gram-partial covariance
must equal numpy's direct computation regardless of partitioning, and the
eigen/projection layer must reproduce numpy's PCA on the same matrix."""

from __future__ import annotations

import numpy as np
import pytest

from wsspark.io import read_table
from wsspark.llmops import pca


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    return np.array([np.asarray(r.embedding, dtype=np.float64) for r in rows])


def np_cov(m):
    mu = m.mean(axis=0)
    return (m.T @ m) / len(m) - np.outer(mu, mu)


def test_covariance_matches_numpy_and_is_partition_invariant(
    spark, sf_dir, emb_np
):
    embs = read_table(spark, sf_dir, "embeddings")
    want = np_cov(emb_np)
    for reshape in (lambda d: d, lambda d: d.repartition(7)):
        got = pca.covariance(reshape(embs))
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) < 1e-10


def test_pca_matches_numpy_eigh(spark, sf_dir, emb_np):
    embs = read_table(spark, sf_dir, "embeddings")
    comps, ev, ratio = pca.pca(embs, k=5)
    vals, vecs = np.linalg.eigh(np_cov(emb_np))
    order = np.argsort(vals)[::-1][:5]
    assert np.allclose(ev, vals[order], atol=1e-10)
    assert np.allclose(ratio, vals[order] / vals.sum(), atol=1e-12)
    assert ratio[0] == max(ratio) and (np.diff(ev) <= 1e-12).all()
    for i, col in enumerate(order):
        v = vecs[:, col]
        # same axis up to sign; the sign fix pins orientation
        assert min(
            np.max(np.abs(comps[i] - v)), np.max(np.abs(comps[i] + v))
        ) < 1e-10
        assert comps[i][int(np.argmax(np.abs(comps[i])))] > 0


def test_projection_reproduces_numpy_scores(spark, sf_dir, emb_np):
    embs = read_table(spark, sf_dir, "embeddings")
    comps, _, _ = pca.pca(embs, k=3)
    out = pca.project(embs, comps)
    assert out.columns == embs.columns + ["pc_scores"]
    got = {
        r.vec_id: np.asarray(r.pc_scores) for r in out.collect()
    }
    want = emb_np @ comps.T
    for i, vid in enumerate(sorted(got)):
        assert np.allclose(got[vid], want[i], atol=1e-10)


def test_pc1_variance_dominates_random_direction(spark, sf_dir, emb_np):
    """The top axis must capture at least as much variance as any random
    unit direction — the defining property, checked end-to-end through
    the distributed pipeline."""
    embs = read_table(spark, sf_dir, "embeddings")
    comps, ev, _ = pca.pca(embs, k=1)
    rng = np.random.RandomState(3)
    for _ in range(5):
        r = rng.randn(emb_np.shape[1])
        r /= np.linalg.norm(r)
        assert ev[0] >= np.var(emb_np @ r) - 1e-12


def test_whitened_coordinates_have_identity_covariance(spark, sf_dir):
    from wsspark.llmops.pca import whiten

    embs = read_table(spark, sf_dir, "embeddings")
    out = whiten(embs, k=6)
    m = np.stack(
        [np.asarray(r.white) for r in out.select("white").collect()]
    )
    cov = np_cov(m)
    assert np.allclose(cov, np.eye(6), atol=1e-6), cov
    # and the mean is removed
    assert np.max(np.abs(m.mean(axis=0))) < 1e-9
