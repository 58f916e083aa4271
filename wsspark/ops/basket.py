"""Market-basket co-occurrence mining: frequent pairs with Apriori
pruning.

The naive pair count self-joins every basket against itself —
quadratic in basket size and, worse, it counts pairs for ITEMS THAT
CANNOT BE FREQUENT. The Apriori principle (Agrawal & Srikant, VLDB'94)
is anti-monotone support: a pair can only reach ``min_support`` if both
of its items do, so a first single-item counting pass (one map-side-
combinable groupBy) shrinks the pair-generation input to frequent items
only — on sparse catalogs that is the difference between a pair space
of |catalog|² and one of |frequent|². The prune is LOSSLESS by the
principle, which the tests re-prove by equality with the unpruned join.

Scale shape: two basket-/item-keyed shuffles (item counts, pair
counts) plus one broadcast of the frequent-item set; per-basket pair
fan-out is C(m, 2) where m = frequent items in the basket — bounded by
real basket sizes (orders hold single-digit lines), and the L1 prune
is exactly what keeps m small when a catalog has head items. All
native operators; lift is a single deterministic division of exact
integer counts.

Reference scope: the co-occurrence structure the reference's transfer
"patterns" report gestures at (etl/transform/warehouse_analytics.py)
— here done for the general basket case with pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Frequent item pairs with support and lift.

    Returns (item_a, item_b, pair_support, support_a, support_b, lift)
    for every unordered pair co-occurring in >= min_support distinct
    baskets, item_a < item_b. Support counts are DISTINCT baskets
    (duplicate lines don't inflate). lift = pair_support * n_baskets /
    (support_a * support_b), rounded 6dp — >1 means the pair co-occurs
    more than independence predicts.
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    items = df.select(
        F.col(basket_col).alias("_basket"), F.col(item_col).alias("_item")
    ).distinct()
    n_baskets = items.select("_basket").distinct().count()
    l1 = (
        items.groupBy("_item")
        .agg(F.count("*").alias("_supp"))
        .filter(F.col("_supp") >= min_support)
    )
    # Apriori prune: only frequent items can form frequent pairs
    frequent = items.join(
        F.broadcast(l1.select("_item")), "_item", "left_semi"
    )
    a, b = frequent.alias("a"), frequent.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._basket") == F.col("b._basket"))
            & (F.col("a._item") < F.col("b._item")),
        )
        .groupBy(
            F.col("a._item").alias("item_a"), F.col("b._item").alias("item_b")
        )
        .agg(F.count("*").alias("pair_support"))
        .filter(F.col("pair_support") >= min_support)
    )
    sa = l1.select(F.col("_item").alias("item_a"), F.col("_supp").alias("support_a"))
    sb = l1.select(F.col("_item").alias("item_b"), F.col("_supp").alias("support_b"))
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .select(
            "item_a",
            "item_b",
            "pair_support",
            "support_a",
            "support_b",
            F.round(
                (F.col("pair_support") * F.lit(n_baskets)).cast("double")
                / (F.col("support_a") * F.col("support_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
