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
    x = F.col(x_col).cast("long")
    y = F.col(y_cents_col).cast("long")
    agg = (
        df.groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_points"),
            F.sum(x).alias("_sx"),
            F.sum(y).alias("_sy"),
            F.sum(x * y).alias("_sxy"),
            F.sum(x * x).alias("_sxx"),
        )
        .filter(F.col("n_points") >= min_points)
    )
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
