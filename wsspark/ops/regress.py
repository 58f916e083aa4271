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
    cursor (the ``snap_sink`` contract), committed ATOMICALLY with the
    state by ``AtomicStateStore`` — one pointer flip advances both, so
    no crash instant exists where a replay could re-merge into already
    updated sums. Structured Streaming guarantees replayed batches keep
    their ids, so restart-from-checkpoint is safe.

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
        from wsspark.statestore import AtomicStateStore

        store = AtomicStateStore(self.state_path)
        if batch_id <= store.last_batch():
            return  # replay: already merged, adding again would double-count
        spark = batch_df.sparkSession
        stats = _suff_stats(batch_df, self.x_col, self.y_col, self.group_cols)
        state = store.read(spark)
        if state is not None:
            stats = state.unionByName(stats)
        merged = stats.groupBy(*self.group_cols).agg(
            F.sum("n_points").alias("n_points"),
            F.sum("_sx").alias("_sx"),
            F.sum("_sy").alias("_sy"),
            F.sum("_sxy").alias("_sxy"),
            F.sum("_sxx").alias("_sxx"),
        )
        store.commit(merged, batch_id)

    def fit(self, spark) -> DataFrame:
        from wsspark.statestore import AtomicStateStore

        state = AtomicStateStore(self.state_path).read(spark)
        if state is None:
            raise FileNotFoundError(f"no committed state in {self.state_path}")
        return _fit_from_stats(state, self.group_cols, self.min_points)


def group_corr(
    df: DataFrame,
    cols: dict[str, int],
    group_cols: tuple[str, ...] = (),
    validate: bool = True,
) -> DataFrame:
    """Pairwise Pearson correlation matrix per group — ONE map-side-
    combinable aggregation for every pair, the multi-column sibling of
    ``group_ols`` (and the scalar-column complement of the embedding
    family's ``covariance_block``).

    ``cols`` maps column -> fixed-point scale. Row values become scaled
    longs; all sums (Σx per column, Σxy per pair incl. variances) are
    accumulated as ``decimal(38,0)`` — EXACT integer arithmetic, order-
    independent, reproduced digit-for-digit by DuckDB's HUGEINT sums —
    and the correlation is a mirrored shape of IEEE double ops on those
    exact sums, so the twin matches to the rounded 6dp.

    Row-level products must fit a long: with ``validate=True`` a
    group-sized second pass checks max|x_i|*max|x_j| < 2^63 from the
    same aggregation's maxima and raises on risk (silent long overflow
    would corrupt sums undetectably). Scale contract: scaled values up
    to ~3e9 are safe.

    Returns (group_cols..., col_x, col_y, n_rows, corr) for every pair
    x < y in ``cols`` order; corr is NULL for zero-variance pairs.
    Rows with a NULL in ANY correlated column are excluded (pairwise-
    complete would need per-pair n; the twin mirrors the listwise
    filter)."""
    names = list(cols)
    if len(names) < 2:
        raise ValueError("need at least two columns")
    sc = {
        c: F.round(F.col(c) * cols[c]).cast("long") for c in names
    }
    # listwise-complete: drop a row if any correlated column is null
    clean = df
    for c in names:
        clean = clean.filter(F.col(c).isNotNull())
    aggs = [F.count("*").alias("_n")]
    for i, c in enumerate(names):
        aggs.append(F.sum(sc[c].cast("decimal(38,0)")).alias(f"_s{i}"))
        aggs.append(F.max(F.abs(sc[c])).alias(f"_m{i}"))
        for j in range(i, len(names)):
            aggs.append(
                F.sum((sc[c] * sc[names[j]]).cast("decimal(38,0)")).alias(
                    f"_p{i}_{j}"
                )
            )
    agg = clean.groupBy(*group_cols).agg(*aggs)
    if validate:
        for row in agg.select(
            *[f"_m{i}" for i in range(len(names))]
        ).collect():
            for i in range(len(names)):
                for j in range(i, len(names)):
                    mi, mj = row[f"_m{i}"], row[f"_m{j}"]
                    if mi is not None and mj is not None and mi * mj >= (1 << 63):
                        raise ValueError(
                            f"row-level product {names[i]}*{names[j]} can "
                            f"overflow long (max |scaled| {mi} * {mj}); "
                            "reduce the scales"
                        )
    n = F.col("_n").cast("double")
    pair_cols = []
    pair_names = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            si = F.col(f"_s{i}").cast("double")
            sj = F.col(f"_s{j}").cast("double")
            pij = F.col(f"_p{i}_{j}").cast("double")
            pii = F.col(f"_p{i}_{i}").cast("double")
            pjj = F.col(f"_p{j}_{j}").cast("double")
            num = n * pij - si * sj
            den = F.sqrt((n * pii - si * si) * (n * pjj - sj * sj))
            pair_cols.append(
                F.round(F.when(den != 0, num / den), 6).alias(f"_c{i}_{j}")
            )
            pair_names.append((i, j))
    wide = agg.select(*group_cols, "_n", *pair_cols)
    stack_args = ", ".join(
        f"'{names[i]}', '{names[j]}', _c{i}_{j}" for i, j in pair_names
    )
    return wide.selectExpr(
        *group_cols,
        "_n AS n_rows",
        f"stack({len(pair_names)}, {stack_args}) AS (col_x, col_y, corr)",
    ).select(*group_cols, "col_x", "col_y", "n_rows", "corr")
