"""Product quantization (wsspark/llmops/pq.py): deterministic training,
round-trip encoding of centroids, ADC-vs-exact consistency, and the
measured recall floor of the shortlist + re-rank compose."""

from __future__ import annotations

import numpy as np
import pytest

from wsspark.io import read_table
from wsspark.llmops import pq


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    embs = read_table(spark, sf_dir, "embeddings")
    rows = embs.select("vec_id", "embedding").collect()
    x = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    ids = sorted(x)
    return embs, ids, np.stack([x[i] for i in ids])


@pytest.fixture(scope="module")
def trained(corpus):
    embs, ids, m = corpus
    books = pq.train_codebooks(embs, m=16, k=32, sample=500)
    codes = pq.encode(embs, books).localCheckpoint()
    return books, codes


def test_training_is_deterministic(corpus):
    embs, _, _ = corpus
    b1 = pq.train_codebooks(embs, m=8, k=16, sample=300)
    b2 = pq.train_codebooks(embs, m=8, k=16, sample=300)
    assert np.array_equal(b1, b2)
    assert b1.shape == (8, 16, 8)


def test_centroid_encodes_to_itself(spark, trained):
    """A vector assembled FROM centroids must encode back to exactly those
    codes (zero quantization error round trip)."""
    books, _ = trained
    m, k, sub = books.shape
    picked = [(j * 7) % k for j in range(m)]
    vec = np.concatenate([books[j, picked[j]] for j in range(m)])
    df = spark.createDataFrame(
        [(1, [float(v) for v in vec])], "vec_id long, embedding array<double>"
    )
    row = pq.encode(df, books).first()
    assert row.codes == picked


def test_adc_distance_matches_decoded_distance(spark, trained, corpus):
    """ADC distance must equal the exact distance to the DECODED
    (reconstructed) vector — the defining identity of the method."""
    books, codes = trained
    embs, ids, mat = corpus
    m, k, sub = books.shape
    q = mat[3]
    got = {
        r.vec_id: r.adc_dist
        for r in pq.adc_topk(codes, books, q, topk=len(ids)).collect()
    }
    code_rows = {r.vec_id: r.codes for r in codes.collect()}
    for vid in ids[:25]:
        recon = np.concatenate(
            [books[j, code_rows[vid][j]] for j in range(m)]
        )
        want = ((recon - q) ** 2).sum()
        assert got[vid] == pytest.approx(want, abs=1e-5), vid


def test_shortlist_rerank_recall_floor(trained, corpus):
    """Pinned measured floor: PQ(16x32) shortlist 10*topk + exact re-rank
    reaches mean recall@10 >= 0.9 (observed 0.99) and min >= 0.7
    (observed 0.9) over 15 corpus queries."""
    books, codes = trained
    embs, ids, mat = corpus
    recalls = []
    for qi in range(0, 30, 2):
        q = mat[qi]
        d = ((mat - q) ** 2).sum(axis=1)
        true = {ids[j] for j in np.argsort(d)[:10]}
        got = {
            r.vec_id
            for r in pq.search_rerank(embs, codes, books, q, topk=10).collect()
        }
        recalls.append(len(true & got) / 10)
    assert np.mean(recalls) >= 0.9, recalls
    assert min(recalls) >= 0.7, recalls


def test_ivf_pq_compose_recall(spark, trained, corpus):
    """The full ladder compose (IVF cells -> PQ ADC -> exact re-rank):
    recall@10 vs brute force over 10 query vectors. Cell misses dominate
    (the PQ re-rank is near-exact), so the floor tracks IVF recall at the
    same probe count — measured on the driver corpus and pinned
    conservatively. Also pins determinism: two runs agree exactly."""
    from wsspark.llmops import similarity

    books, codes = trained
    embs, ids, mat = corpus
    assigned, centroids, n_cells = similarity.ivf_build_index(embs)
    n_probe = similarity.auto_n_probe(n_cells)
    recalls = []
    for qi in range(10):
        q = mat[qi]
        truth = set(
            np.argsort(((mat - q) ** 2).sum(axis=1))[:10].tolist()
        )
        truth = {ids[t] for t in truth}
        got = [
            r.vec_id
            for r in pq.ivf_pq_search(
                embs, assigned, centroids, codes, books, q,
                topk=10, n_probe=n_probe,
            ).collect()
        ]
        assert len(got) == len(set(got)) == 10
        recalls.append(len(truth & set(got)) / 10)
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.8, recalls
    assert min(recalls) >= 0.5, recalls
    # determinism: the compose is pure hash + argmin arithmetic
    q = mat[0]
    a = [r.vec_id for r in pq.ivf_pq_search(
        embs, assigned, centroids, codes, books, q, topk=10,
        n_probe=n_probe).collect()]
    b = [r.vec_id for r in pq.ivf_pq_search(
        embs, assigned, centroids, codes, books, q, topk=10,
        n_probe=n_probe).collect()]
    assert a == b


def test_driver_row_in_cell_shortlist_recall_is_exact(spark, sf_dir, corpus):
    """Contract behind the registered ivf_pq_search driver row: at the
    row's pinned parameters (m=16, k=32, 30x-topk shortlist) the PQ
    shortlist retains EVERY true in-cell top-10 for the pinned query ids,
    so the exact re-rank equals the probed-cell exact top-k the DuckDB
    twin computes. 10x is the documented production trade (recall ~0.99);
    the driver row over-fetches because the synthetic corpus is uniform
    random — PQ's worst case."""
    from wsspark.llmops import similarity
    from wsspark.queries.llm import (
        PQ_QUERY_IDS,
        PQ_SHORTLIST,
        PQ_TOPK,
        q_ivf_pq_search,
    )

    embs, ids, mat = corpus
    idx = {vid: i for i, vid in enumerate(ids)}
    assigned, centroids, n_cells = similarity.ivf_build_index(embs)
    n_probe = similarity.auto_n_probe(n_cells)
    cell_of = {r.neighbor_id: r.centroid_id for r in assigned.collect()}
    cents = {
        r.centroid_id: np.asarray(r._vec, dtype=np.float64)
        for r in centroids.collect()
    }
    got = {}
    for r in q_ivf_pq_search(spark, sf_dir).collect():
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    assert set(got) == set(PQ_QUERY_IDS)
    assert PQ_SHORTLIST >= 30 * PQ_TOPK
    for qid in PQ_QUERY_IDS:
        q = mat[idx[qid]]
        qn = np.linalg.norm(q)
        cos = {
            c: float(v @ q) / (np.linalg.norm(v) * qn) for c, v in cents.items()
        }
        probed = set(sorted(cos, key=lambda c: (-cos[c], c))[:n_probe])
        cand = [vid for vid in ids if cell_of[vid] in probed]
        d = {vid: float(((mat[idx[vid]] - q) ** 2).sum()) for vid in cand}
        truth = sorted(cand, key=lambda vid: (round(d[vid], 6), vid))[:PQ_TOPK]
        assert got[qid] == truth, qid


def test_multi_query_search_matches_single_query_loop(spark, trained, corpus):
    """ivf_pq_search_multi must return, per query, EXACTLY the rows of the
    single-query compose — same rounding, same (dist, id) tiebreaks — so
    the batched serving shape can replace the per-query loop anywhere
    (including the driver row) without changing a single hash."""
    from wsspark.llmops import similarity

    books, codes = trained
    embs, ids, mat = corpus
    assigned, centroids, n_cells = similarity.ivf_build_index(embs)
    n_probe = similarity.auto_n_probe(n_cells)
    qids = [ids[0], ids[7], ids[23]]
    queries = {qid: mat[ids.index(qid)] for qid in qids}

    multi = pq.ivf_pq_search_multi(
        embs, assigned, centroids, codes, books, queries,
        topk=10, n_probe=n_probe,
    ).collect()
    got = {
        qid: sorted(
            (r.neighbor_id, r.dist) for r in multi if r.query_id == qid
        )
        for qid in qids
    }
    for qid in qids:
        single = pq.ivf_pq_search(
            embs, assigned, centroids, codes, books, queries[qid],
            topk=10, n_probe=n_probe,
        ).collect()
        want = sorted((r.vec_id, r.dist) for r in single)
        assert got[qid] == want, qid


def test_pq_store_search_matches_in_memory_and_prunes(
    spark, trained, corpus, tmp_path
):
    """The on-disk PQ store (write_ivf_pq_store / ivf_pq_search_store)
    must return rows IDENTICAL to the in-memory ladder over the same
    index + codebooks, and its plan must show all three prunings: a
    centroid_id PartitionFilter on the scans (directory pruning), an
    ADC scan whose ReadSchema carries the codes but NOT the float
    vectors (column pruning), and a re-rank scan that reads the vectors
    but not the codes."""
    import re

    from wsspark.llmops import similarity

    books, codes = trained
    embs, ids, mat = corpus
    assigned, centroids, n_cells = similarity.ivf_build_index(embs)
    path = str(tmp_path / "pq_store")
    centroids2, books2, n_cells2 = pq.write_ivf_pq_store(
        embs, path, centroids=centroids, codebooks=books
    )
    assert n_cells2 == n_cells and books2 is books

    for qid in (ids[3], ids[11]):
        q = mat[ids.index(qid)]
        got_df = pq.ivf_pq_search_store(
            spark, path, centroids, books, q, topk=10, n_probe=3
        )
        got = [(r[0], r[1]) for r in got_df.collect()]
        want = [
            (r[0], r[1])
            for r in pq.ivf_pq_search(
                embs, assigned, centroids, codes, books, q,
                topk=10, n_probe=3,
            ).collect()
        ]
        assert got == want and len(got) == 10

    plan = got_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pfs = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pfs and all("centroid_id" in p for p in pfs), plan
    schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    assert any("codes" in s and "_vec" not in s for s in schemas), schemas
    assert any("_vec" in s and "codes" not in s for s in schemas), schemas
