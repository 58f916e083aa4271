"""Corpus factory — the round's training-data operators composed into
the full pipeline a 100 TB corpus build would run, end to end over the
driver testdata:

  raw docs -> rule quality gate -> compression repetition gate
           -> near-dup clusters -> survivor dedup
           -> leakage-safe train/test split
           -> per-epoch shard assignment (train side)
           -> versioned snapstore publish (+ CDC read-back)

Each stage's CONTRACT is asserted where it hands off to the next: gates
only shrink, no near-dup pair straddles the split, shard addressing is
total, and the published store reads back exactly what was built. The
point is the composition: every operator is verified alone elsewhere;
pipelines break at the seams.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wsspark import snapstore as ss
from wsspark.io import read_table
from wsspark.llmops import compress, corpus, dedup


def test_corpus_factory_end_to_end(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. rule-based quality gate (filter_reason == KEEP survives)
    gated_ids = corpus.quality_filter(docs).filter(
        F.col("filter_reason") == "KEEP"
    ).select("doc_id")
    gated = docs.join(gated_ids, "doc_id", "left_semi")
    n_gated = gated.count()
    assert 0 < n_gated <= n_raw

    # 2. compression repetition gate (band chosen loose: the synthetic
    # corpus is clean; the stage must still only shrink)
    kept = compress.repetition_gate(gated, min_ratio=0.05, max_ratio=1.5)
    n_kept = kept.count()
    assert 0 < n_kept <= n_gated

    # 3. near-dup clusters -> survivors (one representative per cluster)
    pairs = dedup.jaccard_pairs(
        kept, threshold=0.9, block_cols=("lang",), shingle_k=1
    ).select("doc_a", "doc_b")
    cc = dedup.connected_components(pairs)
    drop = cc.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    survivors = kept.join(F.broadcast(drop), "doc_id", "left_anti")
    n_surv = survivors.count()
    n_drop = drop.count()
    assert n_surv == n_kept - n_drop and n_drop > 0

    # 4. leakage-safe split: no dup-cluster straddles the boundary
    split = corpus.leakage_safe_split(survivors, cc, test_frac=0.2)
    sides = {r.doc_id: r.split for r in split.select("doc_id", "split").collect()}
    cluster_of = {r.node: r.cluster_id for r in cc.collect()}
    by_cluster: dict = {}
    for doc, side in sides.items():
        by_cluster.setdefault(cluster_of.get(doc, doc), set()).add(side)
    assert all(len(s) == 1 for s in by_cluster.values())
    n_test = sum(1 for s in sides.values() if s == "test")
    assert 0 < n_test < len(sides)

    # 5. per-epoch shards on the train side: total stable addressing
    train = split.filter(F.col("split") == "train").drop("split", "split_key")
    shards = corpus.epoch_shard_assignment(train, epoch=0, n_shards=4)
    addr = [(r.shard, r.shard_pos) for r in shards.select("shard", "shard_pos").collect()]
    assert len(addr) == len(set(addr)) == len(sides) - n_test
    assert {s for s, _ in addr} <= set(range(4))

    # 6. publish to a versioned store with skipping stats; CDC composes
    root = str(tmp_path / "corpus_store")
    out = shards.select("doc_id", "lang", "source", "shard", "shard_pos")
    v0 = ss.snap_commit(
        out.repartition(4, "shard"), root, bloom_cols=["doc_id"]
    )
    assert v0 == 0 and ss.snap_count(root) == len(addr)
    # point lookup through the manifest planner returns the exact row
    some_doc = next(iter(sides))
    while sides[some_doc] != "train":
        some_doc = next(k for k, v in sides.items() if v == "train")
    got = ss.snap_read_where_eq(spark, root, "doc_id", some_doc).collect()
    assert len(got) == 1 and got[0].doc_id == some_doc
    # epoch 1 appends as a new version; CDC yields exactly the delta
    shards1 = corpus.epoch_shard_assignment(
        train.withColumn("doc_id", F.col("doc_id") + 1_000_000),
        epoch=1,
        n_shards=4,
    ).select("doc_id", "lang", "source", "shard", "shard_pos")
    ss.snap_commit(shards1.repartition(4, "shard"), root, mode="append",
                   bloom_cols=["doc_id"])
    delta = ss.snap_read_changes(spark, root, since=v0)
    assert delta.count() == len(addr)
    assert delta.filter(F.col("doc_id") < 1_000_000).count() == 0
