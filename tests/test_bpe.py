"""BPE tokenizer: classic-example merges, round-trip reconstruction,
distributed-encode == driver-reference equality, determinism, and the
Arrow-only plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from wsspark.io import read_table
from wsspark.llmops import bpe


def test_learn_bpe_classic_example():
    """Sennrich's worked example shape: with 'low' x5 and 'lower' x2,
    'newest' x6, 'widest' x3, early merges pick up the high-frequency
    adjacent pairs. Verify the first merges and full determinism."""
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.learn_bpe(freqs, n_merges=10)
    # 'es' occurs in newest+widest = 9, the most frequent pair; then
    # 'es'+'t</w>' = 9 again (tie-break keeps it deterministic).
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t</w>")
    # retraining is byte-identical
    assert merges == bpe.learn_bpe(freqs, n_merges=10)


def test_encode_word_round_trip_and_greedy_rank():
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    ranks = {p: i for i, p in enumerate(bpe.learn_bpe(freqs, n_merges=8))}
    for w in ["newest", "lowest", "low", "wide", "unseen"]:
        toks = bpe.encode_word(w, ranks)
        # round trip: concatenation minus the end marker is the word
        assert "".join(toks).replace(bpe.END, "") == w
        assert toks[-1].endswith(bpe.END)


def test_trained_encoder_compresses_training_words():
    """Words from the training corpus must encode to fewer symbols than
    their character length once enough merges are learned."""
    freqs = [("spark", 10), ("sparkly", 4)]
    ranks = {p: i for i, p in enumerate(bpe.learn_bpe(freqs, n_merges=20))}
    assert bpe.encode_word("spark", ranks) == ["spark" + bpe.END]
    assert len(bpe.encode_word("sparkly", ranks)) <= 3


def test_distributed_encode_matches_reference(spark, sf_dir):
    """bpe_encode (Arrow mapInPandas + broadcast ranks) must produce
    token-for-token the driver-side reference encode_text for every
    document, under any input partitioning."""
    docs = read_table(spark, sf_dir, "documents")
    merges = bpe.train_bpe(docs, n_merges=64)
    ranks = {p: i for i, p in enumerate(merges)}
    texts = {
        r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()
    }
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_bpe_tokens"])
        for r in bpe.bpe_encode(docs.repartition(7), merges).collect()
    }
    assert set(got) == set(texts)
    for did, text in texts.items():
        want = bpe.encode_text(text, ranks)
        assert got[did] == (want, len(want)), did
    # tokens really compress: fewer BPE tokens than characters
    n_chars = sum(len(t) for t in texts.values())
    n_toks = sum(n for _, n in got.values())
    assert 0 < n_toks < n_chars


def test_word_frequencies_is_partition_invariant(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = sorted(
        (r["word"], r["freq"])
        for r in bpe.word_frequencies(docs).collect()
    )
    b = sorted(
        (r["word"], r["freq"])
        for r in bpe.word_frequencies(docs.repartition(13)).collect()
    )
    assert a == b and len(a) > 0
    # spot-check one word against a direct count
    w, f = a[0]
    direct = docs.select(
        F.size(F.filter(F.split("text", " "), lambda t: t == F.lit(w))).alias(
            "n"
        )
    ).agg(F.sum("n")).collect()[0][0]
    assert f == direct


def test_bpe_encode_plan_is_arrow_not_row_python(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    merges = [("a", "b</w>")]
    df = bpe.bpe_encode(docs, merges)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # encoding is narrow
