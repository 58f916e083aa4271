"""Exact distributed order statistics WITHOUT a global sort — radix
bisection (16-bit histogram passes).

The naive exact quantile is ``ORDER BY value`` + offset: a full shuffle
sort of the fact, single-reducer at the limit — the one shape the repo
bans. The approximate path (``percentile_approx`` / GK, used by
``brand_price_quantiles``) is mergeable and one-pass but carries an
error bound. This module closes the remaining corner: EXACT order
statistics whose cost is a handful of map-side-combinable aggregation
passes, never a sort.

The classic selection-by-radix scheme: map each value to an
order-preserving unsigned 64-bit key (scaled to integer cents, sign bit
flipped). The kth key is located 16 bits at a time: each pass
histograms the CURRENT candidate range into 2^16 buckets per group
(one groupBy, map-side combinable), the driver walks the <= 65536
cumulative counts to pick the bucket containing rank k, and the next
pass descends into it. Four passes pin all 64 bits; a fifth initial
pass computes group counts to turn fractions into ranks. Multiple
groups and multiple fractions ride the SAME passes (their bucket paths
diverge via a broadcast state join), so the total cost is 5 scans of
the fact regardless of how many quantiles are requested.

100 TB shape: the fact is never shuffled — every pass reduces to
per-(group, path, bucket) partial counts merged map-side; driver state
is O(groups x fractions x buckets-present) rows per pass, independent
of row count. Fully deterministic (ties collapse into the same key, and
the kth ORDER STATISTIC is a value, not a row), so the DuckDB twin is a
plain ``row_number() = k`` replay.

Reference scope: the reference engine computes summary statistics with
pandas describe()/quantile (etl/transform/*.py) — exact because pandas
sorts in RAM. This operator is what that becomes when the frame stops
fitting on one machine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SIGN_FLIP = -(1 << 63)  # XOR mask: flips the sign bit -> unsigned order
_MASK16 = (1 << 16) - 1


def exact_group_quantiles(
    df: DataFrame,
    value_col: str,
    fractions: tuple[float, ...] = (0.5,),
    group_cols: tuple[str, ...] = (),
    scale: int = 100,
) -> DataFrame:
    """Exact type-1 quantiles (value at rank ``ceil(f * n)``) per group.

    ``value_col`` is scaled by ``scale`` and rounded to a long (exact for
    currency at scale=100); the returned ``value`` is descaled, so it is
    exact to 1/scale. Returns (group_cols..., fraction double, value
    double), one row per group x fraction, deterministic.
    """
    if not fractions or any(not (0.0 < f <= 1.0) for f in fractions):
        raise ValueError("fractions must be in (0, 1]")
    spark = df.sparkSession
    gcols = list(group_cols)
    key = (
        F.round(F.col(value_col) * scale)
        .cast("long")
        .bitwiseXOR(F.lit(_SIGN_FLIP))
        .alias("_k")
    )
    base = df.select(*gcols, key).filter(F.col("_k").isNotNull())

    # pass 0: group counts -> ranks (ceil(f*n), clamped to >= 1)
    counts = base.groupBy(*gcols).agg(F.count("*").alias("_n")).collect()
    if not counts:
        return spark.createDataFrame(
            [], base.drop("_k").schema.add("fraction", "double").add("value", "double")
        )
    # driver state: (group values tuple) -> [(fraction, k_remaining, prefix)]
    state: dict[tuple, list[list]] = {}
    for row in counts:
        g = tuple(row[c] for c in gcols)
        state[g] = [[f, max(1, math.ceil(f * row["_n"])), 0] for f in fractions]

    group_key = (
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in gcols])
        if gcols
        else F.lit("")
    )
    gmap = {
        "\x1f".join("" if v is None else str(v) for v in g): g for g in state
    }

    for shift in (48, 32, 16, 0):
        # one row per live (group, path): distinct prefixes to descend into
        paths = sorted(
            {(gs, entry[2]) for gs, g in ((s, gmap[s]) for s in gmap) for entry in state[g]}
        )
        path_df = F.broadcast(
            spark.createDataFrame(paths, "gs string, prefix long")
        )
        cur = base.withColumn("_gs", group_key)
        if shift < 48:
            cur = cur.join(
                path_df,
                (F.col("_gs") == F.col("gs"))
                & (F.shiftrightunsigned("_k", shift + 16) == F.col("prefix")),
            )
        else:
            cur = cur.withColumn("prefix", F.lit(0))
        hist = (
            cur.groupBy(
                "_gs",
                "prefix",
                (F.shiftrightunsigned("_k", shift).bitwiseAND(F.lit(_MASK16))).alias(
                    "_b"
                ),
            )
            .agg(F.count("*").alias("_c"))
            .collect()
        )
        buckets: dict[tuple, list] = {}
        for r in hist:
            buckets.setdefault((r["_gs"], r["prefix"]), []).append((r["_b"], r["_c"]))
        for gs, g in ((s, gmap[s]) for s in gmap):
            for entry in state[g]:
                f, k, prefix = entry
                cum = 0
                for b, c in sorted(buckets[(gs, prefix)]):
                    if cum + c >= k:
                        entry[1] = k - cum
                        entry[2] = (prefix << 16) | b
                        break
                    cum += c
                else:  # pragma: no cover - rank always lands in a bucket
                    raise AssertionError("rank walked past histogram")

    def _unmap(prefix: int) -> float:
        # prefix is the unsigned 64-bit pattern of the sign-flipped key:
        # flip the top bit back, reinterpret as signed, descale.
        ucents = prefix ^ (1 << 63)
        cents = ucents - (1 << 64) if ucents >= (1 << 63) else ucents
        return cents / scale

    out = [
        tuple(g) + (f, _unmap(prefix))
        for g, entries in state.items()
        for f, _k, prefix in entries
    ]
    schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in gcols]
        + ["fraction double", "value double"]
    )
    return spark.createDataFrame(sorted(out), schema)
