"""KMV (k-minimum-values) distinct sketch — the DETERMINISTIC member of
the sketch family. HLL++ (``approx_count_distinct``, certified in the
repo's tpch queries) is the throughput champion but its register state
is engine-internal: no external oracle can recompute it. KMV keeps the
k smallest hash values of the distinct set instead — with the repo's
portable md5 scheme the sketch is a pure function of the data, so the
DRIVER HASH CHECK IS EXACT (DuckDB recomputes the identical k-th hash
and estimate), and the streaming form's state provably equals the batch
sketch over the same rows (bottom-k of a union == merge of bottom-ks —
an algebraic identity, not an approximation).

Estimator (Beyer et al. 2007): with U = kth_hash / 2^60 (the k-th
smallest of n distinct uniform hashes), E[distinct] ~= (k - 1) / U.
Fewer than k distinct -> the sketch IS the distinct set and the count
is exact. Error ~ 1/sqrt(k-2): k=256 -> ~6%.

Scale shape: one distinct-reduce per group key (map-side combinable)
followed by a per-group bottom-k — rank over (key, hash) partitions,
never a global sort; state per group is k longs, constant in data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wsspark.llmops.dedup import portable_hash64

HASH_SPACE = float(1 << 60)  # portable_hash64 is 60-bit (15 hex chars)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: ``(group_cols..., n_seen, kth_hash,
    est_distinct)`` where ``n_seen`` = min(distinct, k) hashes retained,
    ``kth_hash`` = the largest retained hash (the sketch boundary), and
    ``est_distinct`` = exact count below k, else (k-1)/U rounded 4dp.
    Deterministic: same rows -> same sketch, any partitioning."""
    if k < 3:
        raise ValueError(f"k must be >= 3 (estimator needs k-2), got {k}")
    hashed = (
        df.select(*group_cols, F.col(value_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .select(*group_cols, portable_hash64(F.col("_v")).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    bottom = hashed.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= k
    )
    return bottom.groupBy(*group_cols).agg(
        F.count("*").alias("n_seen"),
        F.max("_h").alias("kth_hash"),
        F.round(
            F.when(
                F.count("*") < k, F.count("*").cast("double")
            ).otherwise(
                F.lit(float(k - 1)) / (F.max("_h") / F.lit(HASH_SPACE))
            ),
            4,
        ).alias("est_distinct"),
    )


def kmv_merge_state(state: DataFrame, batch: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Merge a bottom-k state frame ``(group_cols..., _h)`` with a new
    batch's hashes: union -> distinct -> bottom-k again. Because min-k is
    associative and the hash is deterministic, the merged state equals
    the batch sketch over all rows ever seen — pinned in tests."""
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        state.unionByName(batch)
        .distinct()
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


class StreamingKmvSketch:
    """Constant-state streaming distinct estimation per group: a
    foreachBatch sink maintaining the bottom-k hash state in a parquet
    state store (k longs per group FOREVER, corpus-size-independent —
    the same constant-state argument as StreamingBloomNgramIndex).
    Replay-tolerant by construction: re-merging an already-seen batch is
    a no-op because min-k over a set is idempotent.

        q = (stream.writeStream
               .foreachBatch(StreamingKmvSketch(path, ["lang"], "text", k=64))
               .start())

    ``sketch(spark)`` returns the current per-group estimates in the
    same shape as the batch ``kmv_sketch``.
    """

    def __init__(self, state_path: str, group_cols: list[str], value_col: str, k: int = 64):
        if k < 3:
            raise ValueError(f"k must be >= 3, got {k}")
        self.state_path = state_path
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.k = k

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from wsspark.statestore import AtomicStateStore

        store = AtomicStateStore(self.state_path)
        if batch_id <= store.last_batch():
            return  # replay (harmless for min-k, but skip the wasted jobs)
        spark = batch_df.sparkSession
        hashed = (
            batch_df.select(
                *self.group_cols, F.col(self.value_col).alias("_v")
            )
            .filter(F.col("_v").isNotNull())
            .select(
                *self.group_cols, portable_hash64(F.col("_v")).alias("_h")
            )
            .distinct()
        )
        state = store.read(spark)
        if state is not None:
            merged = kmv_merge_state(state, hashed, self.group_cols, self.k)
        else:
            w = Window.partitionBy(*self.group_cols).orderBy("_h")
            merged = (
                hashed.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") <= self.k)
                .drop("_r")
            )
        # versioned commit + atomic pointer flip: a crash at any instant
        # leaves the complete previous state readable (the old overwrite
        # "swap" deleted the store before rewriting it)
        store.commit(merged, batch_id)

    def sketch(self, spark) -> DataFrame:
        from wsspark.statestore import AtomicStateStore

        state = AtomicStateStore(self.state_path).read(spark)
        if state is None:
            raise FileNotFoundError(f"no committed state in {self.state_path}")
        return state.groupBy(*self.group_cols).agg(
            F.count("*").alias("n_seen"),
            F.max("_h").alias("kth_hash"),
            F.round(
                F.when(
                    F.count("*") < self.k, F.count("*").cast("double")
                ).otherwise(
                    F.lit(float(self.k - 1))
                    / (F.max("_h") / F.lit(HASH_SPACE))
                ),
                4,
            ).alias("est_distinct"),
        )
