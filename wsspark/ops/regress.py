"""Grouped closed-form linear regression — per-key trend fitting as ONE
map-side-combinable aggregation.

The anti-pattern at scale is fitting per-group models in a driver loop
(collect each group, fit, repeat) or a per-group Python UDF (ships every
row through Arrow). Simple linear regression needs neither: slope and
intercept are closed forms over five sufficient statistics
(n, Σx, Σy, Σxy, Σx²), each an associative SUM — so ANY number of
per-group fits is a single groupBy aggregation, map-side combinable,
with group-cardinality output. This is the grouped analog of the
distributed logistic regression's one-aggregation gradient step
(``llmops/classifier.py``).

Oracle determinism follows the repo's exactsum discipline: x and y are
fixed-point integers (y in cents), so all five sums are EXACT longs —
order-independent, bit-identical in any engine — and the slope /
intercept are a handful of deterministic IEEE double ops on identical
integers. (Σy² is deliberately NOT computed: at 100 TB cents² overflows
a long; r² belongs to a separate scaled pass if ever needed.)

Reference scope: the reference's trend analyses stop at monthly
aggregation + eyeballing (etl/transform/movement_analytics.py); the fit
is the natural next step and the same shape pandas' polyfit(1) gives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_ols(
    df: DataFrame,
    x_col: str,
    y_cents_col: str,
    group_cols: tuple[str, ...] = (),
    min_points: int = 3,
) -> DataFrame:
    """Per-group simple OLS of integer series (x, y_cents).

    Inputs must already be integral (``x`` an index like month-number,
    ``y_cents`` a fixed-point long — build it with ``exactsum.cents``).
    Returns (group_cols..., n_points, slope_cents, intercept_cents,
    mean_y_cents): slope in cents-per-x-unit, rounded 6dp; groups with
    fewer than ``min_points`` points are dropped (a 2-point "trend" is
    noise presented as signal).
    """
    agg = _suff_stats(df, x_col, y_cents_col, list(group_cols))
    return _fit_from_stats(agg, list(group_cols), min_points)


def _fit_from_stats(
    stats: DataFrame, group_cols: list[str], min_points: int
) -> DataFrame:
    """Closed-form slope/intercept from a sufficient-statistics frame —
    shared by the batch fit and the streaming state fit so the two can
    only ever agree."""
    agg = stats.filter(F.col("n_points") >= min_points)
    n = F.col("n_points")
    num = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    den = (n * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    slope = F.when(den != 0, num / den).otherwise(F.lit(None))
    intercept = (
        F.col("_sy").cast("double") - slope * F.col("_sx").cast("double")
    ) / n.cast("double")
    return agg.select(
        *group_cols,
        "n_points",
        F.round(slope, 6).alias("slope_cents"),
        F.round(intercept, 6).alias("intercept_cents"),
        F.round(F.col("_sy").cast("double") / n.cast("double"), 6).alias(
            "mean_y_cents"
        ),
    )


def _suff_stats(df: DataFrame, x_col: str, y_col: str, group_cols: list[str]) -> DataFrame:
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("n_points"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
    )


class StreamingGroupTrend:
    """Streaming per-group OLS with group-sized state: the five
    sufficient statistics form a commutative MONOID (merge = add), so a
    foreachBatch sink holding one stats row per group fits every group
    over ALL rows ever seen — bit-equal to the batch ``group_ols``.

    Unlike the set-semantics streaming members (bloom bit-OR, KMV
    bottom-k, A-ES top-k), sums are NOT idempotent — a replayed batch
    would double-count. Exactly-once therefore rides on the batch-id
    tag (the ``snap_sink`` contract): the max merged batch_id is stored
    WITH the state, and foreachBatch replays (same or older id) are
    no-ops. Structured Streaming guarantees replayed batches keep their
    ids, so restart-from-checkpoint is safe.

        q = (stream.writeStream
               .foreachBatch(StreamingGroupTrend(path, "month_x",
                                                 "y_cents", ["p_brand"]))
               .start())

    ``fit(spark)`` returns the same frame shape as ``group_ols``.
    """

    def __init__(
        self,
        state_path: str,
        x_col: str,
        y_col: str,
        group_cols: list[str],
        min_points: int = 3,
    ):
        self.state_path = state_path
        self.x_col = x_col
        self.y_col = y_col
        self.group_cols = list(group_cols)
        self.min_points = min_points

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        stats = _suff_stats(
            batch_df, self.x_col, self.y_col, self.group_cols
        ).withColumn("_batch_id", F.lit(int(batch_id)).cast("long"))
        if os.path.exists(self.state_path):
            state = spark.read.parquet(self.state_path)
            last = state.agg(F.max("_batch_id")).collect()[0][0]
            if last is not None and batch_id <= last:
                return  # replay: already merged, adding again would double-count
            stats = state.unionByName(stats)
        merged = (
            stats.groupBy(*self.group_cols)
            .agg(
                F.sum("n_points").alias("n_points"),
                F.sum("_sx").alias("_sx"),
                F.sum("_sy").alias("_sy"),
                F.sum("_sxy").alias("_sxy"),
                F.sum("_sxx").alias("_sxx"),
                F.max("_batch_id").alias("_b"),
            )
            .withColumn("_batch_id", F.lit(int(batch_id)).cast("long"))
            .drop("_b")
        )
        tmp = self.state_path + ".next"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(self.state_path)

    def fit(self, spark) -> DataFrame:
        return _fit_from_stats(
            spark.read.parquet(self.state_path),
            self.group_cols,
            self.min_points,
        )
