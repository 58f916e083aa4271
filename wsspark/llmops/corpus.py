"""Corpus curation operators for training-data pipelines: test-set
decontamination, stratified sampling, and rule-based quality filtering.

All three are deterministic and expressible in portable SQL, so each has a
DuckDB oracle twin in wsspark.queries.llm. Scale posture:

- decontamination broadcasts the benchmark shingle set (benchmark suites are
  thousands of docs, corpora are billions — the asymmetry is the design);
  the corpus side never shuffles, only the tiny hit-count agg does.
- stratified sampling is a pure filter (hash of the id against a per-stratum
  rate) — zero shuffles, no RNG state, reproducible across reruns/retries,
  which row-level ``rand()`` sampling is NOT under task retries.
- quality filtering is a projection over doc_stats — map-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from wsspark.llmops import dedup
from wsspark.llmops.similarity import _KNUTH, _MOD32

DECONTAM_NGRAM = 4


def ngram_overlap_pairs(
    docs: DataFrame,
    bench_pred: Column,
    k: int = DECONTAM_NGRAM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Test-set decontamination: corpus documents sharing at least one
    k-word n-gram with a benchmark document, with the shared-n-gram count.

    ``bench_pred`` marks the benchmark rows inside ``docs`` (callers with a
    separate benchmark table can union it in with a marker column). Corpus
    rows matching the predicate are excluded from the corpus side — a doc
    never "contaminates" itself.

    Plan shape: distinct shingles explode per side; the benchmark side is
    broadcast, so the corpus side joins map-side with no shuffle; only the
    (doc, bench) hit counts — bounded by true contamination, tiny — shuffle
    for the final count.
    """
    # Evaluate the benchmark predicate ONCE as a marker column on the
    # exploded shingle frame: both sides become pure filters of one frame —
    # no join against a (billion-row at scale) corpus id set.
    sh = docs.select(
        F.col(id_col),
        bench_pred.alias("_is_bench"),
        F.explode(dedup.word_shingles(text_col, k)).alias("_ng"),
    )
    bench = sh.filter(F.col("_is_bench")).select(
        F.col(id_col).alias("bench_id"), "_ng"
    )
    corpus = sh.filter(~F.col("_is_bench")).select(id_col, "_ng")
    return (
        corpus.join(F.broadcast(bench), "_ng")
        .groupBy(id_col, "bench_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling (domain/language mixing): keep
    a row iff knuth_hash(id)/2^32 < rate(stratum). The hash is the same
    Knuth multiplicative scheme as the IVF centroid pick — uniform over the
    id space, replicable in any SQL engine, and stable under task retries
    (``rand()``-based sampling resamples on retry and breaks exactly-once
    outputs at scale)."""
    u = F.pmod(F.col(id_col) * F.lit(_KNUTH), F.lit(_MOD32)) / F.lit(_MOD32)
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(r))).otherwise(rate)
    return docs.filter(u < rate)


def domain_mix_sample(
    docs: DataFrame,
    weights: dict[str, float],
    fraction: float = 0.1,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sample to a TARGET domain mixture (the DoReMi / Pile-style corpus
    composition step): ``weights`` gives each stratum's desired SHARE of
    the output and ``fraction`` the desired overall sampling rate; the
    per-stratum keep-rate is derived from the corpus's actual counts:

        rate_s = min(1, fraction * w_s * N / n_s)

    so over-represented domains are thinned toward their target share and
    under-represented ones keep everything they have (a rate is capped at
    1 — without replacement, a domain cannot exceed its supply; the cap
    is the standard behavior and the achieved share then undershoots the
    target, visibly in the summary query).

    Versus ``stratified_sample`` (caller supplies rates directly), this
    derives the rates FROM a target composition — one tiny per-stratum
    count aggregate, broadcast back onto the corpus, then the same
    deterministic Knuth-hash gate (no rand(): stable under retries,
    replicable in any SQL engine). Strata absent from ``weights`` get
    weight 0 and drop. Scale: the count agg is map-side combinable with
    stratum-cardinality output; the rate join broadcasts; the filter is
    map-side — one corpus-scale aggregation, zero corpus shuffles on the
    output path."""
    n_total = docs.select(
        F.count("*").cast("double").alias("_n_total")
    )
    counts = (
        docs.groupBy(strata_col)
        .agg(F.count("*").cast("double").alias("_n_s"))
        .crossJoin(F.broadcast(n_total))
    )
    w = F.lit(0.0)
    for stratum, share in sorted(weights.items()):
        w = F.when(
            F.col(strata_col) == stratum, F.lit(float(share))
        ).otherwise(w)
    rates = counts.select(
        strata_col,
        F.least(
            F.lit(1.0),
            F.lit(float(fraction)) * w * F.col("_n_total") / F.col("_n_s"),
        ).alias("_rate"),
    )
    u = F.pmod(F.col(id_col) * F.lit(_KNUTH), F.lit(_MOD32)) / F.lit(_MOD32)
    return (
        docs.join(F.broadcast(rates), strata_col)
        .filter(u < F.col("_rate"))
        .drop("_rate")
    )


def with_quality_reason(
    docs: DataFrame,
    min_tokens: int = 10,
    max_tokens: int = 1000,
    max_stopword_ratio: float = 0.5,
    min_avg_token_len: float = 3.5,
    text_col: str = "text",
) -> DataFrame:
    """Map-only quality gate that KEEPS the payload columns: every input
    column plus the three gating stats and ``filter_reason`` (KEEP or the
    FIRST failing rule; precedence: length bounds, stopword density, token
    shape — the training-data analog of the warehouse DQ when-chain,
    quality.dq_flag). Zero shuffles, so downstream stages (dedup, chunking)
    can consume the text directly without joining the verdicts back —
    the shape a fused corpus pipeline needs at 100 TB. The stat
    expressions are textstats.stat_exprs, the same single source doc_stats
    uses."""
    from wsspark.llmops.textstats import stat_exprs

    s = stat_exprs(text_col)
    reason = (
        F.when(s["n_tokens"] < min_tokens, "TOO_SHORT")
        .when(s["n_tokens"] > max_tokens, "TOO_LONG")
        .when(s["stopword_ratio"] > max_stopword_ratio, "STOPWORD_HEAVY")
        .when(s["avg_token_len"] < min_avg_token_len, "SHORT_TOKENS")
        .otherwise("KEEP")
    )
    return docs.withColumns(
        {
            "n_tokens": s["n_tokens"],
            "stopword_ratio": s["stopword_ratio"],
            "avg_token_len": s["avg_token_len"],
            "filter_reason": reason,
        }
    )


def quality_filter(
    docs: DataFrame,
    min_tokens: int = 10,
    max_tokens: int = 1000,
    max_stopword_ratio: float = 0.5,
    min_avg_token_len: float = 3.5,
) -> DataFrame:
    """Rule-based corpus quality gate: the stats-and-verdict projection of
    ``with_quality_reason`` (doc_id + gating stats + filter_reason).
    Map-only; no shuffle."""
    return with_quality_reason(
        docs, min_tokens, max_tokens, max_stopword_ratio, min_avg_token_len
    ).select(
        "doc_id",
        "n_tokens",
        "stopword_ratio",
        "avg_token_len",
        "filter_reason",
    )


def pack_chunks(
    chunks: DataFrame,
    budget: int = 1000,
    n_groups: int = 8,
    id_col: str = "doc_id",
    chunk_id_col: str = "chunk_id",
    len_col: str = "chunk_len",
) -> DataFrame:
    """Deterministic concat-and-split packing of variable-length chunks into
    fixed-budget training sequences — the step after ``doc_chunks`` in a
    pretraining corpus build (chunk -> pack -> sample).

    Semantics (the standard pretraining packer, cut rounded to a chunk
    boundary): chunks are laid out in a fixed pseudo-random order — md5 of
    ``doc_id:chunk_id``, so neighboring chunks of one document scatter
    across packs — and the running length is cut at every ``budget``
    boundary. A chunk straddling a boundary joins the pack where it STARTS,
    so a pack may overflow ``budget`` by at most ``max(chunk_len) - 1``;
    every non-final pack in a group also fills past
    ``budget - max(chunk_len)``. (Splitting the straddler instead changes
    only the assignment expression; keeping chunks atomic preserves the
    chunk -> pack provenance an audit needs.)

    Scale shape: ``n_groups`` hash groups bound the window state — one
    hash-partition exchange on the group key, a streaming running sum per
    group (no global single-partition sort, which is the naive packer's
    scale-killer), then one combinable groupBy for the pack rollup. At
    100 TB, size n_groups ~ cluster parallelism; packing quality is
    unaffected because the order inside each group is already uniform.
    Determinism contract matches the rest of corpus.py: pure hash ordering,
    no rand(), identical output under any input partitioning/retries, and a
    DuckDB oracle twin computes it verbatim (portable md5 / hex-prefix
    arithmetic)."""
    uid = F.concat_ws(":", F.col(id_col), F.col(chunk_id_col))
    keyed = chunks.select(
        uid.alias("chunk_uid"),
        F.md5(uid).alias("_pack_key"),
        F.col(len_col).alias("_len"),
        F.pmod(dedup.portable_hash64(uid), F.lit(n_groups))
        .cast("int")
        .alias("pack_group"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("_pack_key", "chunk_uid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = keyed.withColumn(
        "pack_seq",
        F.floor(F.coalesce(F.sum("_len").over(w), F.lit(0)) / budget).cast("int"),
    )
    return (
        assigned.groupBy("pack_group", "pack_seq")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("_len").alias("total_chars"),
            F.round(F.sum("_len") / F.lit(budget), 4).alias("fill_ratio"),
            F.concat_ws(",", F.array_sort(F.collect_list("chunk_uid"))).alias(
                "chunk_uids"
            ),
        )
    )


def per_group_sample(
    df: DataFrame,
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fixed-size-per-group sampling (the reservoir-sample
    use case: k exemplars per language/source/domain for eyeballing or
    eval sets): rank rows inside each group by a portable uniform hash of
    the id — md5 of the id's decimal string, which DuckDB computes
    identically — and keep the first ``k``.

    Versus ``stratified_sample`` (rate-based, output size varies with
    group size), this pins an exact per-group count. Same determinism
    contract: no rand(), so the sample is identical across reruns, task
    retries, and partition layouts. Scale shape: one hash-partition
    exchange on the group key + a streaming rank; with AQE skew handling a
    hot group still ranks in parallel per partition before the final
    window. For billion-row groups where even one sort is too much, the
    scale path is a two-phase top-k (per-partition heap then merge —
    Spark's TakeOrderedAndProject shape) on the same hash ordering."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("sample_rank")
    )


def weighted_sample_topk(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    max_weight: int = 1000,
) -> DataFrame:
    """Exactly-k weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis, 2006), integer-exact and deterministic.

    A-ES: draw key_i = u_i^(1/w_i) per item and keep the top k — that
    set IS a weighted sample without replacement (first pick lands on i
    with probability w_i / sum(w)). The float form is fragile across
    engines (pow/ln differ in the last ulp, and top-k MEMBERSHIP flips
    on boundary ties), so this uses the integer twin: u^(1/w) is
    distributed exactly as the MAXIMUM of w independent uniforms, so for
    integer weights key_i = max_{j=1..w_i} h(id_i, j) with h the
    portable 60-bit md5 hash reproduces A-ES order with pure integer
    comparisons — DuckDB computes bit-identical keys and the top-k set
    is replayable with zero float risk (ties broken by id; a 60-bit
    collision between two specific draws is ~1e-18).

    Weights must be integers in [1, max_weight] (rows outside are
    REJECTED with an eager one-aggregate validation — silently dropping
    or clamping would bias the sample). Cost: the key build explodes
    sum(w) hash rows — weights are quality/domain BUCKETS (single
    digits), not raw counts; the groupBy max is map-side combinable and
    the top-k is Spark's TakeOrderedAndProject (per-partition heap +
    driver merge of k), never a global sort.

    Versus the rate-gated samplers above (`stratified_sample`,
    `domain_mix_sample`: Bernoulli, output size varies), this pins an
    EXACT output size while still respecting weights — the "sample
    exactly 10M documents, quality-weighted" curation step.

    Returns the sampled rows plus ``sample_key`` (the winning hash) and
    ``sample_rank`` (1..k in descending-key order), both deterministic.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keys = (
        _aes_keys(docs, weight_col, id_col, max_weight)
        .orderBy(F.desc("sample_key"), id_col)
        .limit(k)
    )
    ranked = keys.select(
        id_col,
        "sample_key",
        F.row_number()
        .over(Window.orderBy(F.desc("sample_key"), id_col))
        .alias("sample_rank"),
    )
    return docs.join(ranked, id_col)


def _aes_keys(
    docs: DataFrame, weight_col: str, id_col: str, max_weight: int
) -> DataFrame:
    """(id, sample_key) A-ES integer keys: max of w portable hash draws
    per item, after eagerly rejecting invalid weights."""
    w_int = F.col(weight_col).cast("long")
    bad = docs.filter(
        F.col(weight_col).isNull()
        | (w_int != F.col(weight_col))
        | (w_int < 1)
        | (w_int > max_weight)
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"weights must be integers in [1, {max_weight}]; offending row "
            f"{id_col}={bad[0][id_col]} {weight_col}={bad[0][weight_col]}"
        )
    return (
        docs.select(F.col(id_col), F.explode(F.sequence(F.lit(1), w_int)).alias("_j"))
        .select(
            id_col,
            dedup.portable_hash64(
                F.concat(F.col(id_col).cast("string"), F.lit("#"), F.col("_j").cast("string"))
            ).alias("_h"),
        )
        .groupBy(id_col)
        .agg(F.max("_h").alias("sample_key"))
    )


class StreamingWeightedSample:
    """Constant-state streaming exactly-k weighted sampling: A-ES top-k
    is a SEMILATTICE (top-k of a union == top-k of merged top-ks), so a
    foreachBatch sink holding only the current k winners maintains — at
    every point in the stream — the exact sample the batch operator
    would produce over all rows seen so far. State is k rows FOREVER,
    corpus-size-independent (the same constant-state argument as
    StreamingKmvSketch / the streaming bloom index). Replay-tolerant:
    the key is a pure function of (id, weight), so re-merging a seen
    batch is a no-op (weights must be stable per id — a changed weight
    on replay would change the key, which the bit-equality test would
    surface, not silently absorb).

        q = (stream.writeStream
               .foreachBatch(StreamingWeightedSample(path, k=100,
                                                     weight_col="weight"))
               .start())

    ``sample(spark)`` returns (id, sample_key, sample_rank) in the same
    shape as ``weighted_sample_topk``.
    """

    def __init__(
        self,
        state_path: str,
        k: int,
        weight_col: str,
        id_col: str = "doc_id",
        max_weight: int = 1000,
    ):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.state_path = state_path
        self.k = k
        self.weight_col = weight_col
        self.id_col = id_col
        self.max_weight = max_weight

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from wsspark.statestore import AtomicStateStore

        store = AtomicStateStore(self.state_path)
        if batch_id <= store.last_batch():
            return  # replay: max-key top-k is idempotent, skip the jobs
        spark = batch_df.sparkSession
        keys = _aes_keys(
            batch_df, self.weight_col, self.id_col, self.max_weight
        )
        state = store.read(spark)
        if state is not None:
            keys = state.unionByName(keys)
        merged = (
            keys.groupBy(self.id_col)
            .agg(F.max("sample_key").alias("sample_key"))
            .orderBy(F.desc("sample_key"), self.id_col)
            .limit(self.k)
        )
        # versioned commit + atomic pointer flip (a crashed overwrite
        # "swap" would have lost the whole reservoir)
        store.commit(merged, batch_id)

    def sample(self, spark) -> DataFrame:
        from wsspark.statestore import AtomicStateStore

        state = AtomicStateStore(self.state_path).read(spark)
        if state is None:
            raise FileNotFoundError(f"no committed state in {self.state_path}")
        return state.select(
            self.id_col,
            "sample_key",
            F.row_number()
            .over(Window.orderBy(F.desc("sample_key"), self.id_col))
            .alias("sample_rank"),
        )


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    test_frac: float = 0.1,
    id_col: str = "doc_id",
    node_col: str = "node",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Cluster-aware train/test split: near-duplicates NEVER straddle the
    split. A plain per-doc hash split leaks — if doc A is in train and its
    near-copy A' lands in test, the eval measures memorization, not
    generalization (the Lee et al. 2022 dedup finding, applied to the
    split boundary). Here the split gate hashes the doc's dup-CLUSTER id
    (``clusters`` = ``connected_components`` output: node -> min-id
    cluster label; unclustered docs are their own key), so every member
    of a duplicate cluster lands on the same side by construction.

    Gate: knuth_u(split_key) < test_frac -> 'test' else 'train' — the
    same multiplicative-hash uniform as ``stratified_sample``:
    deterministic across reruns/retries/layouts (rand() is neither), and
    replicable in any SQL engine, so the op keeps a full DuckDB oracle.
    The test fraction is therefore approximate at CLUSTER granularity
    (exact-fraction splitting would have to cut a cluster).

    Scale shape: the cluster map is broadcast (it holds only docs that
    appear in a dup pair — the same asymmetry ``dedup_survivors`` leans
    on; for corpora where the clustered subset itself outgrows broadcast,
    drop the hint and this becomes one id-keyed shuffle join), then the
    gate is a map-only expression; the corpus is never shuffled."""
    if not 0.0 < test_frac < 1.0:
        raise ValueError(f"test_frac must be in (0, 1), got {test_frac}")
    keys = clusters.select(
        F.col(node_col).alias(id_col), F.col(cluster_col).alias("split_key")
    )
    u = (
        F.pmod(F.col("split_key") * F.lit(_KNUTH), F.lit(_MOD32))
        / F.lit(_MOD32)
    )
    return (
        docs.join(F.broadcast(keys), id_col, "left")
        .withColumn("split_key", F.coalesce(F.col("split_key"), F.col(id_col)))
        .withColumn(
            "split",
            F.when(u < F.lit(float(test_frac)), F.lit("test")).otherwise(
                F.lit("train")
            ),
        )
    )


def leakage_safe_folds(
    docs: DataFrame,
    clusters: DataFrame,
    n_folds: int = 5,
    id_col: str = "doc_id",
    node_col: str = "node",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Cluster-aware k-fold assignment — ``leakage_safe_split``
    generalized to cross-validation: ``fold = floor(knuth_u(split_key) *
    n_folds)``, so every member of a duplicate cluster shares a fold and
    no evaluation fold ever holds a near-copy of another fold's training
    doc. Same determinism/broadcast contract as the split form."""
    if n_folds < 2:
        raise ValueError(f"n_folds must be >= 2, got {n_folds}")
    keys = clusters.select(
        F.col(node_col).alias(id_col), F.col(cluster_col).alias("split_key")
    )
    u = (
        F.pmod(F.col("split_key") * F.lit(_KNUTH), F.lit(_MOD32))
        / F.lit(_MOD32)
    )
    return (
        docs.join(F.broadcast(keys), id_col, "left")
        .withColumn("split_key", F.coalesce(F.col("split_key"), F.col(id_col)))
        .withColumn("fold", F.floor(u * F.lit(int(n_folds))).cast("int"))
    )


def epoch_shard_assignment(
    docs: DataFrame,
    epoch: int,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch corpus shuffle into balanced training
    shards — the "reshuffle every epoch" step of a training-data
    pipeline, without RNG state. Each doc gets:

    - ``shuffle_key``: md5 of ``"{epoch}:{id}"`` — a fresh pseudorandom
      permutation per epoch (changing ``epoch`` re-deals every doc), yet
      bit-reproducible across reruns, task retries, and partition
      layouts (``rand()``/``shuffle()`` are none of these — a retried
      task would re-deal its rows and break exactly-once shard writes);
    - ``shard``: the key's 60-bit prefix mod ``n_shards`` — uniform, so
      shard sizes concentrate tightly around n/n_shards;
    - ``shard_pos``: rank within the shard by (shuffle_key, id) — the
      read order a trainer consumes, making "shard s, position p" a
      total, stable address for every sample.

    Scale shape: one hash-partition exchange on ``shard`` + an in-shard
    sort (Spark's sort-based shuffle does this in one pass); writing
    with ``.repartition(n_shards, "shard")`` then
    ``partitionBy("shard")`` lands one balanced file set per shard. The
    hash is the portable md5 scheme, so shard assignment AND order have
    a bit-exact SQL twin (driver-hash falsifiable end to end)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if epoch < 0:
        raise ValueError(f"epoch must be >= 0, got {epoch}")
    key = F.md5(
        F.concat_ws(
            ":", F.lit(int(epoch)).cast("string"), F.col(id_col).cast("string")
        )
    )
    out = docs.withColumn("shuffle_key", key).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring(F.col("shuffle_key"), 1, 15), 16, 10).cast(
                "long"
            ),
            F.lit(int(n_shards)),
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", F.col(id_col))
    return out.withColumn("shard_pos", F.row_number().over(w))


def build_corpus(
    docs: DataFrame,
    min_tokens: int = 10,
    max_tokens: int = 1000,
    max_stopword_ratio: float = 0.5,
    min_avg_token_len: float = 3.5,
    dedup_threshold: float = 0.6,
    chunk_size: int = 200,
    overlap: int = 50,
    pack_budget: int = 1000,
    pack_groups: int = 8,
) -> dict[str, DataFrame]:
    """The end-to-end corpus build — the llmops analog of the warehouse
    pipeline's build_reports: quality gate -> near-dup survivor selection
    -> chunk -> pack, each stage exposed as a lazy frame so callers can
    sink any intermediate.

    Stage shapes (all previously verified operators, here fused):
    - ``flagged``: map-only with_quality_reason — zero shuffles, text kept.
    - ``kept``: the KEEP rows (still map-only; fuses into the scan).
    - ``survivors``: MinHash-LSH candidate pairs (never all-pairs) at
      ``dedup_threshold`` over the kept text, connected components, then a
      broadcast left_anti of the non-representative ids — the corpus side
      is never shuffled by the dedup decision.
    - ``chunks``: shuffle-free overlapping char chunking of survivors.
    - ``packs``: fixed-budget deterministic packing (one exchange).

    At 100 TB the chain's only corpus-scale exchanges are inside the LSH
    banding and the pack grouping; quality gating and chunking pipeline
    with the scan, and every stage is deterministic (hash-ordered, no
    rand()), so a retry or re-run reproduces byte-identical output."""
    flagged = with_quality_reason(
        docs, min_tokens, max_tokens, max_stopword_ratio, min_avg_token_len
    )
    kept = flagged.filter(F.col("filter_reason") == "KEEP").drop(
        "n_tokens", "stopword_ratio", "avg_token_len", "filter_reason"
    )
    # postjoin_verify: the kept docs' lineage (quality-gated corpus scan)
    # is expensive to re-derive for the two verification sides — compute
    # shingles only for candidate rows instead (guide §2.3; see
    # minhash_dedup_pairs)
    pairs = dedup.minhash_dedup_pairs(
        kept, threshold=dedup_threshold, postjoin_verify=True
    )
    cc = dedup.connected_components(pairs)
    non_rep = cc.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    survivors = kept.join(F.broadcast(non_rep), "doc_id", "left_anti")
    from wsspark.llmops.textstats import doc_chunks

    chunks = doc_chunks(survivors, chunk_size=chunk_size, overlap=overlap)
    packs = pack_chunks(chunks, budget=pack_budget, n_groups=pack_groups)
    return {
        "flagged": flagged,
        "kept": kept,
        "survivors": survivors,
        "chunks": chunks,
        "packs": packs,
    }


def corpus_build_summary(docs: DataFrame, **kwargs) -> DataFrame:
    """One-row scorecard of the full corpus build (docs in -> quality kept
    -> dedup survivors -> chunks -> packs): the falsifiable end-to-end
    contract for the chain. ``overall_fill_ratio`` divides exact integer
    totals once (total chunk chars over pack capacity), so the value is
    deterministic under any partitioning and replicable in SQL.

    The five aggregate branches re-derive a shared lineage (Spark has no
    cross-branch common-subplan reuse), but MEASURED at sf0.1 that is
    not worth pinning: the chain's expensive part — the LSH banded
    frame — is already localCheckpointed INSIDE minhash_dedup_pairs, so
    each branch's re-derivation is cheap projections over the cached
    bands. Checkpointing the survivor frame here (lazy or eager) was a
    wash (3.7-4.3 s either way, PLANS round-7 wrap), so the summary
    stays a pure lazy composition."""
    budget = kwargs.get("pack_budget", 1000)
    stages = build_corpus(docs, **kwargs)
    n_docs = docs.agg(F.count("*").cast("long").alias("n_docs"))
    n_kept = stages["kept"].agg(
        F.count("*").cast("long").alias("n_quality_kept")
    )
    n_surv = stages["survivors"].agg(
        F.count("*").cast("long").alias("n_survivors")
    )
    ch = stages["chunks"].agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum("chunk_len").cast("long").alias("total_chunk_chars"),
    )
    pk = stages["packs"].agg(F.count("*").cast("long").alias("n_packs"))
    return (
        n_docs.crossJoin(n_kept)
        .crossJoin(n_surv)
        .crossJoin(ch)
        .crossJoin(pk)
        .select(
            "n_docs",
            "n_quality_kept",
            (F.col("n_quality_kept") - F.col("n_survivors"))
            .cast("long")
            .alias("n_dup_dropped"),
            "n_survivors",
            "n_chunks",
            "total_chunk_chars",
            "n_packs",
            F.round(
                F.col("total_chunk_chars")
                / (F.col("n_packs") * F.lit(budget)),
                4,
            ).alias("overall_fill_ratio"),
        )
    )
