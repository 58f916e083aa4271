"""Text analysis operators: token counting, quality scoring, language-ID
heuristic. All pure Spark expressions (no UDFs) — string ops stay inside
whole-stage codegen, so these scale linearly with input bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Real pipelines plug a fastText-style model in via mapInPandas;
# the operator contract (text -> (lang_pred, lang_score)) stays the same.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "les"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("的", "是", "了", "在", "我"),
}


def tokens(text_col: str = "text") -> Column:
    """Whitespace tokenization as a native expression."""
    return F.split(F.col(text_col), " ")


def bpe_ish_tokens(text_col: str = "text") -> Column:
    """A BPE-ish regex tokenizer: words, numbers, and single punctuation
    marks as separate tokens (coarse token-count estimator for budget
    accounting — the shape GPT-style pre-tokenizers use)."""
    return F.expr(
        f"regexp_extract_all({text_col}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)"
    )


def stat_exprs(
    text_col: str = "text", stopwords: tuple[str, ...] = STOPWORDS
) -> dict[str, Column]:
    """The shared per-document quality-stat expressions (single source of
    truth for doc_stats and the map-only quality gate): token count, char
    count, mean token length (chars minus separators over tokens), and
    stopword ratio — all native codegen expressions."""
    toks = tokens(text_col)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_chars = F.length(F.col(text_col))
    return {
        "n_tokens": n_tokens.cast("long"),
        "n_chars_actual": n_chars.cast("long"),
        "avg_token_len": F.round(
            (n_chars - (n_tokens - 1)).cast("double") / n_tokens, 4
        ),
        "stopword_ratio": F.round(n_stop.cast("double") / n_tokens, 4),
    }


def doc_stats(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS,
    min_tokens: int = 10,
    max_stopword_ratio: float = 0.5,
) -> DataFrame:
    """Length / token / stopword-based quality scoring per document."""
    s = stat_exprs(text_col, stopwords)
    return docs.select(
        "doc_id",
        s["n_tokens"].alias("n_tokens"),
        s["n_chars_actual"].alias("n_chars_actual"),
        s["avg_token_len"].alias("avg_token_len"),
        s["stopword_ratio"].alias("stopword_ratio"),
        (
            (s["n_tokens"] >= min_tokens)
            & (s["stopword_ratio"] <= max_stopword_ratio)
        ).alias("is_quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts per document."""
    return docs.select(
        "doc_id",
        F.size(tokens(text_col)).cast("long").alias("n_ws_tokens"),
        F.size(bpe_ish_tokens(text_col)).cast("long").alias("n_bpe_tokens"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: score each language by how many of its
    profile words appear, pick the argmax (ties -> lexicographically first
    language, deterministic). Runs as one pass of array expressions."""
    toks = F.array_distinct(tokens(text_col))
    scores = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(
                        toks, F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
                    )
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_PROFILES)
        ]
    )
    # sort by (-score, lang) ascending -> head = max score, lex-first on ties
    best = F.array_sort(
        F.transform(
            scores,
            lambda s: F.struct((-s["score"]).alias("neg_score"), s["lang"].alias("lang")),
        )
    )[0]
    return docs.select(
        "doc_id",
        best["lang"].alias("lang_pred"),
        (-best["neg_score"]).cast("long").alias("lang_score"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document: the share of the most
    frequent word (`top_word_share`) and the distinct-word ratio
    (`unique_ratio`). High top-word share / low unique ratio flag
    boilerplate and degenerate repetition — standard pre-training filters
    (Rae et al. 2021 "Gopher" §A1.1 repetition rules).

    Plan: explode words -> one (doc, word) count agg (map-side combinable)
    -> one per-doc agg + a top-1 window for the argmax word. Two exchanges
    keyed by doc_id-scale cardinality; no UDFs, no collect.
    """
    w = docs.select("doc_id", F.explode(tokens(text_col)).alias("w"))
    counts = w.groupBy("doc_id", "w").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    top = (
        counts.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("cnt").desc(), F.col("w").asc()
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("w").alias("top_word"))
    )
    stats = counts.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("n_distinct_words"),
        F.max("cnt").alias("_top_cnt"),
    )
    return (
        stats.join(top, "doc_id")
        .select(
            "doc_id",
            "n_words",
            "n_distinct_words",
            "top_word",
            F.round(F.col("_top_cnt").cast("double") / F.col("n_words"), 4).alias(
                "top_word_share"
            ),
            F.round(
                F.col("n_distinct_words").cast("double") / F.col("n_words"), 4
            ).alias("unique_ratio"),
        )
    )


def bigrams(text_col: str = "text") -> Column:
    """Word-bigram array as a pure expression (adjacent-token pairs joined
    with a space). Empty array for docs with fewer than two tokens."""
    return F.expr(
        f"CASE WHEN size(split({text_col}, ' ')) < 2 THEN array() "
        f"ELSE transform(slice(split({text_col}, ' '), 1, "
        f"size(split({text_col}, ' ')) - 1), "
        f"(x, i) -> concat(x, ' ', split({text_col}, ' ')[i + 1])) END"
    )


def bigram_topk(docs: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """Corpus-wide top-k bigram frequencies (n-gram language-model stats /
    boilerplate detection). One explode -> one count agg (map-side
    combinable, cardinality = vocabulary^2 observed, not corpus size) ->
    global top-k with a total order (count desc, bigram asc) so the cut is
    deterministic. The final sort-limit is a TakeOrderedAndProject, not a
    full sort."""
    return (
        docs.select(F.explode(bigrams(text_col)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(k)
    )


def bigram_lm_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document statistical-LM quality score WITHOUT an external model:
    train an add-one-smoothed bigram model on the corpus itself and score
    each doc by its mean natural-log bigram probability (and perplexity
    ``exp(-score)``) — the classic cheap perplexity filter of a
    training-data pipeline; fluent/common text scores high, gibberish and
    boilerplate-free noise score low.

    ``P(w2|w1) = (c(w1 w2) + 1) / (c_prefix(w1) + V)`` over bigram
    POSITIONS (occurrences, not distinct types). Docs with fewer than two
    tokens have no bigrams and produce no row.

    Scale shape: one bigram explode (corpus-linear) feeds two map-side-
    combined aggregates whose cardinality is observed bigram/prefix TYPES
    (vocabulary-bounded, not corpus-bounded); the per-position frame then
    joins the model keyed by type and takes the 1-row vocabulary size via
    a broadcast crossJoin — never a collected driver value (the
    tfidf_top_terms discipline)."""
    pos = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(bigrams(text_col)).alias("bigram")
    )
    c2 = pos.groupBy("bigram").agg(F.count("*").alias("_c2"))
    c1 = (
        c2.groupBy(F.split(F.col("bigram"), " ")[0].alias("_w1"))
        .agg(F.sum("_c2").alias("_c1"))
    )
    vocab = docs.select(F.explode(tokens(text_col)).alias("_w")).agg(
        F.countDistinct("_w").alias("_V")
    )
    lp = F.log(
        (F.col("_c2") + F.lit(1.0)) / (F.col("_c1") + F.col("_V"))
    )
    scored = (
        pos.join(c2, "bigram")
        .join(c1, F.split(F.col("bigram"), " ")[0] == F.col("_w1"))
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lp.alias("_lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("_lp"), 4).alias("avg_logprob"),
        F.round(F.exp(-F.avg("_lp")), 4).alias("ppl"),
    )


def normalize_text(text_col: str = "text") -> Column:
    """Canonical text normalization for dedup keys: lowercase, collapse
    every non-alphanumeric run to a single space, trim. Pure codegen
    expressions — at 100 TB this is a mapper-side projection fused into the
    scan. (Unicode NFC/NFKC folding would slot in here via
    ``normalize_unicode`` below when non-ASCII corpora need it.)"""
    lowered = F.lower(F.col(text_col))
    return F.trim(F.regexp_replace(lowered, "[^a-z0-9]+", " "))


def normalize_unicode(
    docs: DataFrame,
    form: str = "NFKC",
    casefold: bool = True,
    text_col: str = "text",
    out_col: str = "norm_text",
) -> DataFrame:
    """Unicode normalization for multilingual dedup keys — the slot-in
    ``normalize_text`` documents for non-ASCII corpora: compatibility
    forms (NFKC) fold fullwidth forms, ligatures, and compatibility
    variants to canonical codepoints, and ``casefold`` applies the full
    Unicode case folding (stronger than lower(): it folds eszett,
    final sigma, etc.). Without this, byte-exact and md5-keyed dedup
    misses trivially-variant duplicates in any corpus with non-ASCII
    content.

    Spark has no native Unicode-normalization expression, so this is the
    same deliberate Arrow boundary as the multimodal decoders: a narrow
    ``mapInPandas`` (stdlib ``unicodedata``, no per-row Python UDF), zero
    shuffle, pipelines with the scan. All other input columns pass
    through untouched."""
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    if text_col not in docs.columns:
        raise ValueError(f"missing text column {text_col!r}")
    from pyspark.sql import types as T

    # StructType.add MUTATES (and DataFrame.schema is cached) — build a
    # fresh StructType so the input frame's schema is never corrupted
    schema = T.StructType(
        list(docs.schema.fields) + [T.StructField(out_col, T.StringType())]
    )

    def run(batches):
        for pdf in batches:
            s = pdf[text_col].map(
                lambda t: unicodedata.normalize(form, t) if t is not None else None
            )
            if casefold:
                s = s.map(lambda t: t.casefold() if t is not None else None)
            pdf = pdf.copy()
            pdf[out_col] = s
            yield pdf

    return docs.mapInPandas(run, schema=schema)


def normalized_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-dup groups AFTER normalization — catches trivial variants
    (case, punctuation, whitespace) that byte-exact dedup misses. One
    map-side md5 projection + one combinable groupBy on the 128-bit key;
    the same single-shuffle scaling as exact dedup.

    Returns every group (like ``exact_dedup_groups``) so the result is a
    falsifiable per-doc check even on dup-free corpora; filter
    ``n_docs > 1`` for the duplicate set."""
    keyed = docs.select(
        "doc_id", F.md5(normalize_text(text_col)).alias("norm_hash")
    )
    return keyed.groupBy("norm_hash").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").alias("keep_doc_id"),
    )


def cross_doc_ngram_dup(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level duplicated n-gram profile: for every document, the
    fraction of its token n-gram WINDOWS whose n-gram also occurs in at
    least one OTHER document — the substring-granularity duplication
    signal behind exact-substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"). Complements the existing
    family: ``repetition_stats`` measures WITHIN-doc repetition,
    ``near_dup_jaccard``/minhash measure whole-doc similarity; this is the
    cross-doc, sub-document grain (boilerplate headers, license blocks,
    templated spans).

    Per doc: ``n_windows`` (token positions admitting an n-gram),
    ``n_dup_windows`` (positions whose n-gram appears in >= 2 distinct
    docs), ``dup_ratio``. Docs shorter than ``n`` tokens report 0/0/0.0.

    Scale shape: each n-gram is keyed by a PORTABLE 64-bit md5 prefix
    (16 hex chars — replicable in any SQL engine) so the gram shuffles
    move fixed 16-byte keys, never n-gram strings. Two exchanges total
    (plan-asserted): (1) the gram-key dup agg — ">= 2 distinct docs" is
    computed as min(doc) != max(doc), a plain combinable agg, where
    countDistinct would two-phase the gram stream through an extra
    shuffle — and (2) the final per-doc agg; the dup join-back rides
    exchange (1)'s partitioning. The explode itself is narrow and
    pipelines with the scan. The 100 TB upgrade is
    ``cross_doc_ngram_dup_bloom`` below: it replaces the join-back (whose
    build side is gram-scale, unbroadcastable at corpus size) with a
    broadcast Bloom membership test. The exact keyed-join form is kept as
    the oracle-verbatim baseline. No UDFs, no collect."""
    if n < 2:
        raise ValueError(f"n-gram size must be >= 2, got {n}")
    g = _gram_positions(docs, n, text_col, id_col)
    # ">= 2 distinct docs" needs only min != max — a plain combinable
    # min/max agg, ONE exchange, where countDistinct would two-phase the
    # same gram stream through an extra shuffle
    gram_docs = g.groupBy("gram_key").agg(
        (F.min(id_col) != F.max(id_col)).alias("_dup")
    )
    per_doc = (
        g.join(gram_docs, "gram_key")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("_nw"),
            F.sum(F.col("_dup").cast("int")).cast("long").alias("_ndup"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("_nw", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("_ndup", F.lit(0)).cast("long").alias("n_dup_windows"),
        )
        .withColumn(
            "dup_ratio",
            F.round(
                F.when(F.col("n_windows") == 0, F.lit(0.0)).otherwise(
                    F.col("n_dup_windows") / F.col("n_windows")
                ),
                4,
            ),
        )
    )


def _gram_positions(
    docs: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, gram_key) per token n-gram WINDOW position — the shared
    narrow explode both dup-profile variants consume. Keys are the
    portable 16-hex md5 prefix of the space-joined window."""
    tmp = "_toks"
    while tmp == id_col:
        tmp += "_"
    gram_keys = F.when(
        F.size(F.col(tmp)) >= n,
        F.expr(
            f"transform(sequence(1, size({tmp}) - {n - 1}), "
            f"i -> substring(md5(array_join(slice({tmp}, i, {n}), ' ')), 1, 16))"
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    return docs.select(F.col(id_col), tokens(text_col).alias(tmp)).select(
        F.col(id_col), F.explode(gram_keys).alias("gram_key")
    )


def cross_doc_ngram_dup_bloom(
    docs: DataFrame,
    n: int = 5,
    n_bits: int = 1 << 20,
    k: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The SCALE path of ``cross_doc_ngram_dup``: same per-doc duplicated
    n-gram profile, but the corpus-scale count join-back is replaced by a
    broadcast Bloom membership test (llmops.bloom) over the dup-gram set.

    Exchange accounting vs the exact variant: the exact form shuffles the
    full gram-position stream TWICE (doc-count agg + count join-back);
    here the position stream shuffles only for the doc-count agg that
    derives the dup keys — the membership test is k broadcast joins
    against a ~n_bits/63-row bitmap, entirely map-side. One corpus-scale
    exchange saved, which at 100 TB is the dominant cost.

    Accuracy contract: NO false negatives (every truly duplicated window
    counts), false positives at the standard bloom rate — so per doc
    ``n_dup_windows`` here is >= the exact value, with overshoot bounded
    by fp ~ (1 - e^(-k*n_dup/n_bits))^k (size n_bits >= 16x the expected
    dup-gram count for < 0.3%). The whole filter is deterministic md5
    arithmetic, so the approximate answer itself is exactly reproducible
    — and exactly replicable by the DuckDB oracle, which is why this
    query keeps a full driver hash check despite being approximate."""
    from wsspark.llmops import bloom

    if n < 2:
        raise ValueError(f"n-gram size must be >= 2, got {n}")
    g = _gram_positions(docs, n, text_col, id_col)
    dup_keys = (
        g.groupBy("gram_key")
        .agg((F.min(id_col) != F.max(id_col)).alias("_dup"))
        .filter(F.col("_dup"))
        .select("gram_key")
    )
    bitmap = bloom.bloom_bitmap(dup_keys, "gram_key", n_bits, k)
    tested = bloom.with_bloom_test(g, "gram_key", bitmap, n_bits, k)
    per_doc = tested.groupBy(id_col).agg(
        F.count("*").cast("long").alias("_nw"),
        F.sum(F.col("bloom_hit").cast("int")).cast("long").alias("_ndup"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("_nw", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("_ndup", F.lit(0)).cast("long").alias("n_dup_windows"),
        )
        .withColumn(
            "dup_ratio",
            F.round(
                F.when(F.col("n_windows") == 0, F.lit(0.0)).otherwise(
                    F.col("n_dup_windows") / F.col("n_windows")
                ),
                4,
            ),
        )
    )


def doc_chunks(
    docs: DataFrame,
    chunk_size: int = 200,
    overlap: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size overlapping character chunking — the training-data prep
    step that turns documents into model-sized windows (context packing /
    RAG indexing). Chunk i covers [i*stride, i*stride + chunk_size) with
    stride = chunk_size - overlap; start offsets run while
    start <= len - overlap - 1, which guarantees (a) full coverage (the
    last start is >= len - chunk_size) and (b) every chunk after the first
    contributes more than ``overlap`` new characters — no degenerate
    fully-contained tail chunk.

    Scale shape: ``explode`` is a NARROW transformation — no shuffle, no
    state; output bytes = input * (1 + overlap/stride). At 100 TB this
    pipelines with the parquet scan partition-by-partition, and the chunk
    frame inherits the input partitioning for any downstream shuffle.
    The reference has no chunking (it is a relational stock engine); this
    extends the llmops text family the way a pretraining corpus build
    needs. Character-grain is the deterministic baseline; token-aligned
    variants change only the start-offset expression."""
    if overlap >= chunk_size:
        raise ValueError(f"overlap {overlap} must be < chunk_size {chunk_size}")
    stride = chunk_size - overlap
    n = F.length(F.col(text_col))
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(stride)
    )
    # Only id_col + the aliased text enter the intermediate frame, so the
    # temp name can collide only with id_col itself — make it impossible.
    tmp = "_t"
    while tmp == id_col:
        tmp += "_"
    return docs.select(
        F.col(id_col),
        F.col(text_col).alias(tmp),
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
    ).select(
        id_col,
        "chunk_id",
        "chunk_start",
        F.substring(F.col(tmp), F.col("chunk_start") + 1, chunk_size).alias(
            "chunk_text"
        ),
        F.length(
            F.substring(F.col(tmp), F.col("chunk_start") + 1, chunk_size)
        ).alias("chunk_len"),
    )


def doc_chunks_tokens(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-aligned training-window chunking — the token-budget twin of
    ``doc_chunks``: windows of ``chunk_tokens`` whitespace tokens advancing
    by ``chunk_tokens - overlap_tokens``, so no word is ever split and
    every chunk fits a fixed token budget (what a tokenizer-fed packer
    needs; ``pack_chunks`` consumes either grain).

    Same scale shape as the char-grain version: posexplode(sequence) over
    a pre-split token array is a NARROW transformation — zero Exchange,
    pipelines with the scan, output inherits input partitioning. Slicing
    the shared token array per window costs O(chunk) per chunk (no
    re-tokenization per window)."""
    if overlap_tokens >= chunk_tokens:
        raise ValueError(
            f"overlap {overlap_tokens} must be < chunk_tokens {chunk_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap_tokens - 1, F.lit(0)), F.lit(stride)
    )
    tmp = "_toks"
    while tmp == id_col:
        tmp += "_"
    window = F.slice(F.col(tmp), F.col("tok_start") + 1, chunk_tokens)
    return docs.select(
        F.col(id_col),
        toks.alias(tmp),
        F.posexplode(starts).alias("chunk_id", "tok_start"),
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("tok_start").cast("long").alias("tok_start"),
        F.size(window).cast("long").alias("n_chunk_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )


def token_heavy_hitters(
    docs: DataFrame,
    support: float = 0.002,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT frequent tokens via the two-pass heavy-hitters pattern —
    the classic sketch family's fourth member beside HLL distinct
    (approx_distinct_accuracy), GK quantiles (brand_price_quantiles),
    and Bloom membership:

    1. Sketch pass: Spark's ``freqItems`` (a distributed, mergeable
       Karp/Misra-Gries variant) returns a CANDIDATE set guaranteed to
       contain every token with frequency > support — false positives
       possible, false negatives not. The candidate list collected to
       the driver is bounded by ~1/support (the CONFIGURED support,
       never corpus size).
    2. Verify pass: one exact groupBy counting ONLY candidate tokens
       (broadcast isin prunes before the shuffle), filtered against the
       exact total with the sketch's strict-inequality guarantee.

    Because the final filter applies exact counts to a superset, the
    output is EXACTLY {token : count > support * total} no matter what
    the sketch over-returned — deterministic and fully oracle-able
    (folded query ``token_heavy_hitters``), while the heavy lifting
    stays one sketch pass + one pruned count at any scale."""
    if not 0 < support < 1:
        raise ValueError(f"support must be in (0,1), got {support}")
    toks = docs.select(F.explode(tokens(text_col)).alias("token")).filter(
        F.col("token") != ""
    )
    cand = toks.stat.freqItems(["token"], support).collect()[0][0]
    if not cand:
        return toks.select(
            F.col("token"),
            F.lit(0).cast("long").alias("n_occurrences"),
            F.lit(0.0).alias("token_share"),
        ).limit(0)
    total = toks.agg(F.count("*").cast("long").alias("_total"))
    return (
        toks.filter(F.col("token").isin(*[str(c) for c in cand]))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") > F.lit(support) * F.col("_total"))
        .select(
            "token",
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("_total"), 6).alias(
                "token_share"
            ),
        )
    )
