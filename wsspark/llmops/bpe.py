"""From-scratch byte-pair-encoding tokenizer, distributed the way BPE is
actually trained at corpus scale (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units").

The reference engine has no tokenizer (it is a relational stock engine,
see SURVEY.md); this extends the llmops text family with the one
pretraining-pipeline stage the family still lacked: REAL subword
tokenization, not just token counting (textstats.bpe_ish_tokens is a
count estimator, not an encoder).

Scale split — the key insight that makes BPE trainable on 100 TB:
merge learning never touches the corpus. It operates on the WORD
FREQUENCY table, whose size is the unique-word vocabulary (sub-linear in
corpus size; tens of millions of rows at web scale, not trillions). So:

1. ``word_frequencies`` — ONE distributed pass: explode whitespace words,
   map-side-combinable groupBy count. The only corpus-scale shuffle.
2. ``learn_bpe`` — the classic merge loop over the collected frequency
   dict, driver-side. Driver-side is CORRECT here for the same reason
   pca.covariance combines partials on the driver: the input is
   vocabulary-sized, corpus-size-independent. Deterministic: best pair =
   max summed frequency, ties broken by the lexicographically smallest
   pair, so retrained merges are byte-identical across runs/partitionings.
3. ``bpe_encode`` — distributed apply: the learned merge ranks broadcast
   to every executor, Arrow ``mapInPandas`` greedily merges the
   lowest-rank adjacent pair per word (the standard BPE apply), with a
   per-batch word cache (Zipf reuse makes the cache hit rate high). No
   corpus shuffle at all — encoding pipelines with the scan.

Python here is deliberate and Arrow-batched: the merge loop is
data-dependent iteration no Spark SQL expression can express (same
boundary as multimodal decode); everything around it stays JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the single corpus-scale pass BPE
    training needs. Map-side combinable; shuffle width = vocabulary."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _word_symbols(word: str) -> tuple[str, ...]:
    """A word's initial symbol sequence: characters, last one carrying the
    end-of-word marker (the classic Sennrich convention, so merges can
    distinguish word-final from word-internal contexts)."""
    if not word:
        return ()
    chars = list(word)
    chars[-1] = chars[-1] + END
    return tuple(chars)


def learn_bpe(
    word_freqs: Iterable[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The classic BPE merge-learning loop over a word-frequency table.

    Each round counts adjacent symbol pairs weighted by word frequency,
    merges the most frequent pair (ties: lexicographically smallest, so
    training is fully deterministic), and rewrites the affected words.
    Cost is O(n_merges * vocab * avg_word_len) — vocabulary-sized, never
    corpus-sized; an incremental pair-count update (only words containing
    the merged pair change) is the standard constant-factor optimization
    and does not change the output."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in word_freqs:
        syms = _word_symbols(word)
        if syms:
            vocab[syms] = vocab.get(syms, 0) + int(freq)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_syms = tuple(out)
            new_vocab[new_syms] = new_vocab.get(new_syms, 0) + freq
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE apply for one word: repeatedly merge the adjacent pair
    with the LOWEST learned rank until none applies — the standard
    (GPT-2-style) application order, which reproduces training exactly
    when the ranks come from ``learn_bpe`` on the same corpus."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_text(text: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Whitespace-split a document and BPE-encode every word (the
    driver-side reference implementation the distributed encoder must
    match token-for-token)."""
    out: list[str] = []
    for w in text.split(" "):
        if w:
            out.extend(encode_word(w, ranks))
    return out


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed BPE encoding: broadcast the merge ranks, apply per word
    via Arrow ``mapInPandas`` with a per-batch word cache (Zipfian reuse
    makes most lookups cache hits). Output: (id, tokens array<string>,
    n_bpe_tokens). Narrow — no shuffle; pipelines with the scan."""
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast({pair: i for i, pair in enumerate(merges)})

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = bc.value
        cache: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            out: list[str] = []
            for w in text.split(" "):
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    hit = encode_word(w, ranks)
                    cache[w] = hit
                out.extend(hit)
            return out

        for pdf in batches:
            toks = pdf[text_col].map(enc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_bpe_tokens": toks.map(len),
                }
            )

    schema = f"{id_col} long, tokens array<string>, n_bpe_tokens long"
    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)


def train_bpe(
    docs: DataFrame, n_merges: int = 200, text_col: str = "text"
) -> list[tuple[str, str]]:
    """End-to-end training convenience: one distributed frequency pass,
    then the driver-side merge loop. The collect is vocabulary-sized (the
    deliberate, corpus-size-independent driver step — see module
    docstring)."""
    freqs = [
        (r["word"], r["freq"])
        for r in word_frequencies(docs, text_col).collect()
    ]
    return learn_bpe(freqs, n_merges)
