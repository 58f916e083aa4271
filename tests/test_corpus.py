"""Corpus-curation operators: decontamination finds planted overlap and
only that; stratified sampling is deterministic and rate-proportional;
quality gating applies rules in precedence order; quantized ANN recalls the
exact top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from wsspark.io import read_table
from wsspark.llmops import corpus, similarity


def test_decontam_finds_planted_overlap(spark):
    phrase = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (100, f"benchmark question about {phrase} end"),  # benchmark
            (1, f"train doc mentions {phrase} twice {phrase} here"),
            (2, "totally unrelated training text with no overlap at all"),
            (3, f"another contaminated one {phrase} yes"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["doc_id"], r["bench_id"]): r["n_shared_ngrams"]
        for r in corpus.ngram_overlap_pairs(
            docs, F.col("doc_id") == 100, k=4
        ).collect()
    }
    assert set(got) == {(1, 100), (3, 100)}
    # doc 1 shares the two 4-grams inside the 5-word phrase (distinct
    # shingles, so repeating the phrase doesn't double-count)
    assert got[(1, 100)] == 2


def test_decontam_benchmark_never_self_matches(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    pairs = corpus.ngram_overlap_pairs(docs, F.col("doc_id") % 50 == 0)
    assert pairs.filter(F.col("doc_id") % 50 == 0).count() == 0


def test_stratified_sample_deterministic_and_proportional(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    rates = {"en": 0.5, "de": 0.25}
    s1 = corpus.stratified_sample(docs, rates).select("doc_id")
    s2 = corpus.stratified_sample(docs, rates).select("doc_id")
    ids1 = {r["doc_id"] for r in s1.collect()}
    assert ids1 == {r["doc_id"] for r in s2.collect()}  # no RNG drift

    kept = corpus.stratified_sample(docs, rates).groupBy("lang").count()
    totals = docs.groupBy("lang").count().withColumnRenamed("count", "n")
    ratio = {
        r["lang"]: r["count"] / r["n"]
        for r in kept.join(totals, "lang").collect()
    }
    assert abs(ratio["en"] - 0.5) < 0.15
    assert abs(ratio["de"] - 0.25) < 0.15
    assert set(ratio) == {"en", "de"}  # default rate 0.0 drops other strata


def test_quality_filter_rule_precedence(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two"),  # 2 tokens -> TOO_SHORT
            (2, " ".join(["the"] * 30)),  # stopword_ratio 1.0 -> STOPWORD_HEAVY
            (3, " ".join(["aa"] * 30)),  # avg len 2.0 -> SHORT_TOKENS
            (4, " ".join(["sufficiently"] * 30)),  # KEEP
            (5, "the " * 2 + "x"),  # short AND stopword-heavy -> TOO_SHORT wins
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["filter_reason"]
        for r in corpus.quality_filter(
            docs, min_tokens=10, max_tokens=1000,
            max_stopword_ratio=0.5, min_avg_token_len=3.5,
        ).collect()
    }
    assert got == {
        1: "TOO_SHORT",
        2: "STOPWORD_HEAVY",
        3: "SHORT_TOKENS",
        4: "KEEP",
        5: "TOO_SHORT",
    }


def test_quantized_topk_recall_vs_exact(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    exact = similarity.cosine_topk(emb, qs, k=5)
    quant = similarity.quantized_topk(emb, qs, k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    q = {(r["query_id"], r["neighbor_id"]) for r in quant.collect()}
    assert len(e & q) / len(e) >= 0.9  # int8 shortlist keeps the real top-k


def test_per_group_sample_matches_duckdb_oracle(spark, sf_dir):
    """Full pytest-side oracle (the folded-query discipline): the md5-rank
    sample must be byte-identical to the same SQL in DuckDB — that IS the
    portability claim of using md5-of-decimal-string as the sort key."""
    import os

    import duckdb

    got = sorted(
        (r.lang, r.doc_id)
        for r in corpus.per_group_sample(
            read_table(spark, sf_dir, "documents"), k=5
        ).select("lang", "doc_id").collect()
    )
    con = duckdb.connect()
    want = sorted(
        con.execute(
            f"""
            SELECT lang, doc_id FROM (
                SELECT lang, doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS rk
                FROM '{os.path.join(sf_dir, "documents.parquet")}'
            ) WHERE rk <= 5
            """
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_per_group_sample_exact_k_and_partition_invariant(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = corpus.per_group_sample(docs, k=3)
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    group_sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(3, group_sizes[lang])
    base = sorted((r.lang, r.doc_id) for r in out.select("lang", "doc_id").collect())
    alt = sorted(
        (r.lang, r.doc_id)
        for r in corpus.per_group_sample(docs.repartition(7), k=3)
        .select("lang", "doc_id")
        .collect()
    )
    assert base == alt


def test_build_corpus_stage_invariants(spark, sf_dir):
    """The end-to-end chain's containment and conservation contracts:
    survivors <= kept <= docs (by id subset), chunks cover exactly the
    survivor set, chunk chars reconstruct each survivor's length, and the
    summary row equals the stage counts."""
    docs = read_table(spark, sf_dir, "documents")
    kw = dict(
        min_tokens=20, max_tokens=80, max_stopword_ratio=0.15,
        min_avg_token_len=4.4, dedup_threshold=0.6,
        chunk_size=200, overlap=50, pack_budget=1000, pack_groups=8,
    )
    stages = corpus.build_corpus(docs, **kw)
    doc_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    kept_ids = {r.doc_id for r in stages["kept"].select("doc_id").collect()}
    surv_ids = {
        r.doc_id for r in stages["survivors"].select("doc_id").collect()
    }
    assert surv_ids <= kept_ids <= doc_ids
    # chunking covers exactly the survivors, and chunk chars sum to the
    # overlap-inflated total (every chunk after the first re-covers
    # `overlap` chars)
    chunk_rows = stages["chunks"].select("doc_id", "chunk_len").collect()
    assert {r.doc_id for r in chunk_rows} == surv_ids
    lens = {
        r.doc_id: r.n for r in stages["survivors"]
        .select("doc_id", F.length("text").alias("n")).collect()
    }
    from collections import defaultdict
    per_doc = defaultdict(lambda: [0, 0])  # [n_chunks, total_chars]
    for r in chunk_rows:
        per_doc[r.doc_id][0] += 1
        per_doc[r.doc_id][1] += r.chunk_len
    for did, (nch, tot) in per_doc.items():
        assert tot == lens[did] + 50 * (nch - 1), did
    # summary row equals the stage counts
    s = corpus.corpus_build_summary(docs, **kw).collect()[0]
    assert s.n_docs == len(doc_ids)
    assert s.n_quality_kept == len(kept_ids)
    assert s.n_survivors == len(surv_ids)
    assert s.n_dup_dropped == len(kept_ids) - len(surv_ids)
    assert s.n_chunks == len(chunk_rows)
    assert s.total_chunk_chars == sum(r.chunk_len for r in chunk_rows)
    packs = stages["packs"].collect()
    assert s.n_packs == len(packs)
    assert sum(p.n_chunks for p in packs) == s.n_chunks
    assert sum(p.total_chars for p in packs) == s.total_chunk_chars


def test_domain_mix_sample_matches_duckdb_oracle(spark, sf_dir):
    """Target-share mixture sampling: byte-identical to the same
    arithmetic in DuckDB (Knuth-hash gate + derived per-stratum rates),
    the rate cap engages for an over-weighted stratum, thinned strata
    land near their target composition, and zero-weight strata drop."""
    import os

    import duckdb

    weights = {"src0": 0.2, "src1": 0.15, "src2": 0.05, "src3": 0.6}
    fraction = 0.1
    docs = read_table(spark, sf_dir, "documents")
    out = corpus.domain_mix_sample(docs, weights, fraction=fraction)
    got = sorted((r.source, r.doc_id) for r in out.select("source", "doc_id").collect())
    case = "CASE source " + " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in sorted(weights.items())
    ) + " ELSE 0.0 END"
    path = os.path.join(sf_dir, "documents.parquet")
    con = duckdb.connect()
    want = sorted(
        con.execute(
            f"""
            WITH rates AS (
                SELECT source,
                       LEAST(1.0, {fraction} * {case}
                             * (SELECT COUNT(*) FROM '{path}')::DOUBLE
                             / COUNT(*)) AS rate
                FROM '{path}' GROUP BY source
            )
            SELECT d.source, d.doc_id
            FROM '{path}' d JOIN rates r USING (source)
            WHERE CAST((d.doc_id * 2654435761) % 4294967296 AS DOUBLE)
                  / 4294967296 < r.rate
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0
    # zero-weight strata drop entirely
    assert {s for s, _ in got} <= set(weights)
    # with ~uniform strata (1/20 each), src3's derived rate is
    # 0.1 * 0.6 * 20 = 1.2 -> capped at 1: every src3 doc kept
    n_src3 = docs.filter(F.col("source") == "src3").count()
    assert sum(1 for s, _ in got if s == "src3") == n_src3
    # partition invariance (no rand())
    again = sorted(
        (r.source, r.doc_id)
        for r in corpus.domain_mix_sample(
            docs.repartition(9), weights, fraction=fraction
        ).select("source", "doc_id").collect()
    )
    assert again == got


def test_leakage_safe_split_clusters_never_straddle(spark):
    """Every member of a duplicate cluster lands on the same side; the
    split is deterministic, partition-invariant, and roughly hits the
    requested test fraction at cluster granularity."""
    docs = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    # synthetic cluster map: docs 0-99 in 20 clusters of 5 (label = min id)
    clusters = spark.range(0, 100).select(
        F.col("id").alias("node"),
        (F.floor(F.col("id") / 5) * 5).alias("cluster_id"),
    )
    out = corpus.leakage_safe_split(docs, clusters, test_frac=0.2)
    rows = {r.doc_id: (r.split_key, r.split) for r in out.collect()}
    assert len(rows) == 500
    for base in range(0, 100, 5):
        sides = {rows[i][1] for i in range(base, base + 5)}
        assert len(sides) == 1  # whole cluster on one side
        assert {rows[i][0] for i in range(base, base + 5)} == {base}
    # unclustered docs key on their own id
    assert all(rows[i][0] == i for i in range(100, 500))
    # fraction sanity at cluster granularity (20 clusters + 400 singles)
    n_test = sum(1 for k, s in rows.values() if s == "test")
    assert 0.10 * 500 < n_test < 0.30 * 500
    # determinism under a different layout
    again = {
        r.doc_id: (r.split_key, r.split)
        for r in corpus.leakage_safe_split(
            docs.repartition(7), clusters.repartition(3), test_frac=0.2
        ).collect()
    }
    assert again == rows
    import pytest as _pytest

    with _pytest.raises(ValueError, match="test_frac"):
        corpus.leakage_safe_split(docs, clusters, test_frac=1.5)


def test_epoch_shard_assignment_properties(spark):
    """Balanced shards, total in-shard addressing, a fresh permutation
    per epoch, and layout-independent determinism."""
    import pytest as _pytest

    docs = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    a = corpus.epoch_shard_assignment(docs, epoch=0, n_shards=8)
    rows = {r.doc_id: (r.shard, r.shard_pos) for r in a.collect()}
    assert len(rows) == 4000
    # balance: uniform hash -> every shard within +-20% of 500
    from collections import Counter

    sizes = Counter(s for s, _ in rows.values())
    assert set(sizes) == set(range(8))
    assert all(400 <= n <= 600 for n in sizes.values())
    # shard_pos is a total address: 1..size within each shard
    by_shard = Counter()
    positions = {}
    for doc, (s, p) in rows.items():
        positions.setdefault(s, set()).add(p)
    for s, n in sizes.items():
        assert positions[s] == set(range(1, n + 1))
    # next epoch re-deals: most docs move shard (expected 7/8)
    b = {
        r.doc_id: (r.shard, r.shard_pos)
        for r in corpus.epoch_shard_assignment(
            docs, epoch=1, n_shards=8
        ).collect()
    }
    moved = sum(1 for d in rows if rows[d][0] != b[d][0])
    assert moved > 0.75 * 4000
    # deterministic under a different partition layout
    again = {
        r.doc_id: (r.shard, r.shard_pos)
        for r in corpus.epoch_shard_assignment(
            docs.repartition(13), epoch=0, n_shards=8
        ).collect()
    }
    assert again == rows
    with _pytest.raises(ValueError, match="n_shards"):
        corpus.epoch_shard_assignment(docs, epoch=0, n_shards=0)
    with _pytest.raises(ValueError, match="epoch"):
        corpus.epoch_shard_assignment(docs, epoch=-1, n_shards=4)


def test_leakage_safe_folds_cluster_coherent(spark):
    """k-fold generalization: whole clusters share a fold; folds cover
    0..k-1 roughly evenly; fold-0 of the 5-fold split is consistent with
    the binary split at test_frac=0.2 (same hash, same boundary)."""
    import pytest as _pytest

    docs = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    clusters = spark.range(0, 100).select(
        F.col("id").alias("node"),
        (F.floor(F.col("id") / 5) * 5).alias("cluster_id"),
    )
    out = {r.doc_id: r.fold for r in corpus.leakage_safe_folds(
        docs, clusters, n_folds=5
    ).collect()}
    for base in range(0, 100, 5):
        assert len({out[i] for i in range(base, base + 5)}) == 1
    from collections import Counter

    sizes = Counter(out.values())
    assert set(sizes) == set(range(5))
    assert all(120 <= n <= 280 for n in sizes.values())
    # fold 0 == the 'test' side of leakage_safe_split(0.2): same gate
    split = {r.doc_id: r.split for r in corpus.leakage_safe_split(
        docs, clusters, test_frac=0.2
    ).collect()}
    assert all((split[d] == "test") == (f == 0) for d, f in out.items())
    with _pytest.raises(ValueError, match="n_folds"):
        corpus.leakage_safe_folds(docs, clusters, n_folds=1)


def test_weighted_sample_topk_properties(spark):
    """A-ES invariants: exactly k rows, deterministic across reruns,
    inclusion respects weights in aggregate (heavy bucket overrepresented
    relative to its population share), ranks are 1..k by descending key."""
    from wsspark.llmops.corpus import weighted_sample_topk

    rows = [(i, 10 if i % 10 == 0 else 1) for i in range(1, 2001)]
    df = spark.createDataFrame(rows, "doc_id long, weight int")
    out = weighted_sample_topk(df, k=200, weight_col="weight").collect()
    assert len(out) == 200
    ranks = sorted(r.sample_rank for r in out)
    assert ranks == list(range(1, 201))
    by_rank = sorted(out, key=lambda r: r.sample_rank)
    keys = [r.sample_key for r in by_rank]
    assert keys == sorted(keys, reverse=True)
    # heavy items are 10% of the population with 10x weight -> expected
    # share of the sample ~
    # 52% (weight share 2000/3800); wide-margin assert
    heavy = sum(1 for r in out if r.weight == 10)
    assert heavy > 60, f"heavy items underrepresented: {heavy}/200"
    rerun = weighted_sample_topk(df, k=200, weight_col="weight").collect()
    assert {(r.doc_id, r.sample_key, r.sample_rank) for r in rerun} == {
        (r.doc_id, r.sample_key, r.sample_rank) for r in out
    }


def test_weighted_sample_topk_rejects_bad_weights(spark):
    import pytest as _pytest

    from wsspark.llmops.corpus import weighted_sample_topk

    for bad in (0.0, -1.0, 2000.0, None, 1.5):
        df = spark.createDataFrame(
            [(1, 3.0), (2, bad)], "doc_id long, weight double"
        )
        with _pytest.raises(ValueError):
            weighted_sample_topk(df, k=1, weight_col="weight")
    with _pytest.raises(ValueError):
        weighted_sample_topk(
            spark.createDataFrame([(1, 1)], "doc_id long, weight int"),
            k=0,
            weight_col="weight",
        )


def test_weighted_sample_matches_python_replay(spark):
    """The integer A-ES key is pure function of (id, weight): replay it
    in Python (hashlib md5, same '#'-joined draw strings) and the top-k
    set, keys, and ranks must match exactly."""
    import hashlib

    from wsspark.llmops.corpus import weighted_sample_topk

    rows = [(i, 1 + (i % 5)) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "doc_id long, weight int")
    got = {
        r.doc_id: (r.sample_key, r.sample_rank)
        for r in weighted_sample_topk(df, k=40, weight_col="weight").collect()
    }

    def key(i, w):
        return max(
            int(hashlib.md5(f"{i}#{j}".encode()).hexdigest()[:15], 16)
            for j in range(1, w + 1)
        )

    replay = sorted(((key(i, w), i) for i, w in rows), key=lambda t: (-t[0], t[1]))[:40]
    want = {i: (k, rank + 1) for rank, (k, i) in enumerate(replay)}
    assert got == want


def test_streaming_weighted_sample_equals_batch(spark, sf_dir, tmp_path):
    """A-ES top-k is a semilattice: merging per-batch top-ks equals the
    batch sample over all rows — EXACT equality including ranks. Replay
    of a seen batch is a no-op; state never exceeds k rows."""
    import pyspark.sql.functions as F

    from wsspark.io import read_table
    from wsspark.llmops.corpus import StreamingWeightedSample, weighted_sample_topk

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "weight",
        (F.lit(1) + F.least(F.lit(9), F.floor(F.col("n_chars") / 100))).cast("long"),
    )
    state = str(tmp_path / "wsample_state")
    sink = StreamingWeightedSample(state, k=50, weight_col="weight")
    batches = [docs.filter(F.col("doc_id") % 4 == i) for i in range(4)]
    for i, b in enumerate(batches):
        sink(b, i)
        from wsspark.statestore import AtomicStateStore

        assert AtomicStateStore(state).read(spark).count() <= 50

    want = sorted(
        (r.doc_id, r.sample_key, r.sample_rank)
        for r in weighted_sample_topk(docs, k=50, weight_col="weight").collect()
    )
    got = sorted(map(tuple, sink.sample(spark).collect()))
    assert got == want

    sink(batches[2], 99)  # replay
    assert sorted(map(tuple, sink.sample(spark).collect())) == want
