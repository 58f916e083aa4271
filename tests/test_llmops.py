"""LLM-op scale paths verified against their exact counterparts: IVF ANN vs
brute force, language-ID on planted text, winnowing fingerprint candidates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wsspark.io import read_table
from wsspark.llmops import fingerprint, similarity, textstats


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def test_ivf_scores_match_bruteforce(spark, emb):
    """Every (query, neighbor) the IVF path returns must carry the same
    cosine the exact path computes; recall@5 must be usable (>0.4 with
    4/16 probes on random synthetic vectors)."""
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.ivf_topk(emb, queries, k=5).collect()
    }
    all_scores = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.cosine_topk(emb, queries, k=10**9).collect()
    }
    for pair, score in approx.items():
        assert all_scores[pair] == score  # approx never mis-scores a pair
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall > 0.4, f"IVF recall@5 too low: {recall:.2f}"


def test_lang_id_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat is on the mat and the dog is in the house"),
            (2, "el gato y el perro en la casa de los amigos"),
            (3, "le chat et le chien dans la maison des amis"),
        ],
        ["doc_id", "text"],
    )
    langs = {r["doc_id"]: r["lang_pred"] for r in textstats.lang_id(docs).collect()}
    assert langs[1] == "en"
    assert langs[2] == "es"
    assert langs[3] == "fr"


def test_winnowing_shared_fingerprints(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = spark.createDataFrame(
        [(1, base), (2, base + " extra tail words here"), (3, "zzz " * 30)],
        ["doc_id", "text"],
    )
    fps = fingerprint.winnow_fingerprints(docs)
    cands = {
        (r["doc_a"], r["doc_b"]): r["n_shared_fingerprints"]
        for r in fingerprint.fingerprint_candidates(fps).collect()
    }
    assert (1, 2) in cands and cands[(1, 2)] > 0
    assert not any(3 in pair for pair in cands)
