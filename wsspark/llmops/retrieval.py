"""Lexical retrieval (BM25) and rank fusion — the text side of the
retrieval pair whose vector side is ``llmops/similarity``/``pq``.

A training-data/RAG pipeline needs both: ANN over embeddings for
semantic neighbors, BM25 over tokens for exact-term evidence, and a
fusion step that merges the two rankings without score calibration.

- ``doc_postings``: the inverted-index frame ``(doc_id, dl, term, tf)``
  in ONE corpus shuffle (doc length rides the explode as a constant
  per-doc grouping key, so no second pass or join for ``dl``).
- ``bm25_search``: Okapi BM25 (Robertson et al., TREC-3; the
  non-negative Lucene idf variant ``ln(1 + (N - df + .5)/(df + .5))``)
  for a small query frame against the corpus. Scale shape: the corpus is
  scanned exactly TWICE (the postings build and the N/avgdl stats pass);
  postings are immediately pruned to the query vocabulary by a broadcast
  join and that small ``matched`` frame (sum of query-term dfs, the rows
  scoring must touch anyway) is materialized once — ``df``/``idf`` and
  the scoring join both derive from it, so nothing corpus-sized is ever
  re-exploded; the final top-k window partitions by query. Distinct
  query terms score once (documented choice — short-query convention).
- ``rrf_fuse``: reciprocal-rank fusion (Cormack, Clarke & Buettcher,
  SIGIR 2009): ``score = sum_r 1/(k0 + rank_r)`` over the input
  rankings. Rank-only, so BM25 and cosine scores need no calibration.
- ``hybrid_related_docs``: the composed operator — per query document,
  BM25 more-like-this over text fused with exact cosine over embeddings.

Determinism/oracle: every score is deterministic arithmetic; ranks
order by the 6dp-ROUNDED score (then id) so FP summation-order noise
(~1e-15) can never flip a rank across engines — the property that lets
the DuckDB twins in wsspark/queries/llm.py hash-check both the BM25
ranking and the fused hybrid output exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75
DEFAULT_RRF_K = 60


def _tokens(text_col):
    return F.filter(F.split(text_col, " "), lambda x: x != "")


def doc_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, dl, term, tf): the inverted index as a frame. One corpus
    shuffle — ``dl`` is constant per doc so grouping by it is free."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(_tokens(F.col(text_col))).cast("long").alias("dl"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """Top-k BM25 docs per query: (query_id, doc_id, score, rank).
    ``queries`` is a small frame (query_id, text) — it is broadcast; the
    corpus is never joined on anything wider than the query vocabulary.
    Docs matching no query term never appear (score would be 0)."""
    postings = doc_postings(docs, text_col, id_col)
    stats = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg(F.size(_tokens(F.col(text_col)))).alias("avgdl"),
    )
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(_tokens(F.col(query_text_col))).alias("term"),
        )
        .distinct()
    )
    # Prune the corpus-sized postings to the QUERY vocabulary once and
    # materialize the (small: sum of query-term dfs) result — both the df
    # aggregation and the scoring join derive from it, so the corpus is
    # scanned exactly twice total (postings + stats), never re-exploded
    # per derived frame (plan-asserted in tests/test_plans.py).
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    ).localCheckpoint(eager=False)
    # (doc_id, term) is unique in postings, so count(*) per term == df.
    term_df = matched.groupBy("term").agg(
        F.count("*").cast("long").alias("df_t")
    )
    qstats = (
        qterms.join(term_df, "term")  # terms absent from the corpus drop out
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
            ),
        )
        .select("query_id", "term", "idf", "avgdl")
    )
    scored = (
        matched.join(F.broadcast(qstats), "term")
        .withColumn(
            "_contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("_contrib"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 5,
    k0: int = DEFAULT_RRF_K,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of (query_id, <id>, rank) frames:
    (query_id, <id>, rrf_score, rank). An id missing from one ranking
    simply contributes nothing from it (the standard RRF convention).
    Output rank orders by (6dp-rounded rrf_score desc, id)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            "query_id",
            F.col(id_col),
            (F.lit(1.0) / (F.lit(k0) + F.col("rank"))).alias("_c"),
        )
        for r in rankings
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    fused = unioned.groupBy("query_id", id_col).agg(
        F.round(F.sum("_c"), 6).alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rrf_score", "rank")
    )


def hybrid_related_docs(
    docs: DataFrame,
    vectors: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    k0: int = DEFAULT_RRF_K,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Related-documents hybrid retrieval: for each query document id,
    fuse BM25 more-like-this (the query doc's own text as the query)
    with exact cosine over the embedding table, by RRF. The query doc
    itself is excluded from both rankings. ``query_ids`` is a 1-column
    frame of document ids present in both tables."""
    from wsspark.llmops.similarity import cosine_topk

    qids = query_ids.select(F.col(query_ids.columns[0]).alias("query_id"))
    qtext = docs.join(
        F.broadcast(qids), F.col(id_col) == F.col("query_id")
    ).select("query_id", F.col(text_col).alias("text"))
    # each leg fetches k+1 so dropping the self-hit still leaves k; ranks
    # are re-assigned after the drop so both legs feed clean 1..k ranks
    lex = bm25_search(
        docs, qtext, k=k + 1, text_col=text_col, id_col=id_col
    ).filter(F.col("doc_id") != F.col("query_id"))
    wl = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    lex = (
        lex.withColumn("rank", F.row_number().over(wl))
        .filter(F.col("rank") <= k)
    )
    qvecs = vectors.join(
        F.broadcast(qids), F.col(vec_id_col) == F.col("query_id")
    ).select(F.col("query_id").alias(vec_id_col), F.col(vec_col))
    sem = cosine_topk(vectors, qvecs, k=k + 1, vec_col=vec_col, id_col=vec_id_col)
    ws = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    sem = (
        sem.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(ws))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    )
    return rrf_fuse([lex.select("query_id", "doc_id", "rank"), sem], k=k, k0=k0)
