"""Distributed second-moment statistics + PCA for embedding columns.

The embedding-postprocessing steps a training-data pipeline runs after
generating vectors — mean-centering, whitening, dimensionality reduction,
drift diagnostics — all start from the corpus covariance matrix. At 100 TB
that is the textbook two-phase reduce:

1. **Partition-local Gram accumulation** (`gram_moments`): one
   ``mapInPandas`` pass emits per-partition ``(n, Σx, ΣxxT)`` — numpy
   matmul over the Arrow batch, so the heavy O(n·d²) work happens
   columnar, in parallel, with zero per-row Python overhead.
2. **Tiny final combine**: the partials are one row per partition
   (d + d² doubles each — ~33 KB at d=64), summed driver-side. This is
   NOT a driver-side data scan: the reduce input is O(partitions), the
   same contract as any treeAggregate.

Eigendecomposition of the resulting d×d matrix is O(d³) driver math
(microseconds at d=64; still trivial at d=4096) — the standard split for
distributed PCA (Spark MLlib's RowMatrix.computePrincipalComponents does
exactly this shape).

The covariance entries themselves are driver-hash-verified against
DuckDB's ``covar_pop`` (queries/llm.py `embedding_covariance_block`); the
eigen/projection layer is pytest-verified against numpy on the same
matrix.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_MOMENT_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("s", ArrayType(DoubleType()), False),
        StructField("g", ArrayType(DoubleType()), False),
    ]
)


def gram_moments(embs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-partition (count, Σx, flattened ΣxxT) partials."""

    def _part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n += m.shape[0]
            s = m.sum(axis=0) + (0 if s is None else s)
            g = m.T @ m + (0 if g is None else g)
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [list(s)], "g": [list(g.ravel())]}
            )

    return embs.select(vec_col).mapInPandas(_part, _MOMENT_SCHEMA)


def moments(
    embs: DataFrame, vec_col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, population covariance) from one distributed pass."""
    parts = gram_moments(embs, vec_col).collect()  # O(partitions) rows
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    g = np.sum([np.asarray(p["g"]) for p in parts], axis=0)
    d = s.shape[0]
    mu = s / n
    return n, mu, g.reshape(d, d) / n - np.outer(mu, mu)


def covariance(embs: DataFrame, vec_col: str = "embedding") -> np.ndarray:
    """Population covariance matrix (d×d numpy) from one distributed pass."""
    return moments(embs, vec_col)[2]


def pca(
    embs: DataFrame, k: int = 8, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-k principal axes of the embedding corpus.

    Returns (components k×d, explained_variance k, explained_ratio k),
    eigenvalues descending. Components carry a deterministic sign fix
    (largest-|coord| entry made positive) so reruns and engines agree."""
    cov = covariance(embs, vec_col)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ev = vals[order]
    return comps, ev, ev / vals.sum()


def project(
    embs: DataFrame,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pc_scores",
) -> DataFrame:
    """Project every embedding onto the given axes — a broadcast matmul
    per Arrow batch (components ship by value in the closure, ~k·d
    doubles; never a join)."""
    comp = np.asarray(components, dtype=np.float64)
    out_schema = StructType(
        list(embs.schema.fields)
        + [StructField(out_col, ArrayType(DoubleType()), True)]
    )

    def _proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                m = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                pdf = pdf.assign(**{out_col: list((m @ comp.T))})
                pdf[out_col] = pdf[out_col].map(list)
            else:
                pdf = pdf.assign(**{out_col: []})
            yield pdf

    return embs.mapInPandas(_proj, out_schema)


def whiten(
    embs: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    out_col: str = "white",
    eps: float = 1e-9,
) -> DataFrame:
    """PCA whitening: center on the corpus mean, project onto the top-k
    axes and scale each by 1/sqrt(eigenvalue), so the output coordinates
    have identity covariance (the standard embedding postprocess before
    cosine-based dedup/retrieval — removes dominant-direction bias). One
    distributed moments pass + one broadcast-matmul pass; the transform
    matrix is k×d driver math."""
    _, mu, cov = moments(embs, vec_col)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    w = vecs[:, order] / np.sqrt(vals[order] + eps)  # d×k
    comp = w.T  # k×d
    out_schema = StructType(
        list(embs.schema.fields)
        + [StructField(out_col, ArrayType(DoubleType()), True)]
    )

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                m = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                scores = (m - mu[None, :]) @ comp.T
                pdf = pdf.assign(**{out_col: [list(r) for r in scores]})
            else:
                pdf = pdf.assign(**{out_col: []})
            yield pdf

    return embs.mapInPandas(_apply, out_schema)
