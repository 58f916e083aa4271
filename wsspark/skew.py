"""Skew-handling utilities for hot-key workloads.

The reference's data model bakes in 80/20 hot-product skew
(gen/generate_data.py:114-117; 20% of products get 80% of movements), which
at 100 TB turns any per-product shuffle into a straggler problem. AQE's
skew-join splitting (on by default in wsspark.session) covers sort-merge
joins; these helpers cover the two cases AQE does not:

- ``salted_agg``: pre-aggregate on (key, salt) so no single reducer owns a
  hot key, then combine the per-salt partials. MEASURED (r06,
  tools/measure_skew.py, PLANS.md skew section): for algebraic aggregates
  Spark's map-side partial aggregation already collapses a hot key to one
  row per input partition — partition boundaries are the salt — so plain
  ``groupBy`` beats this helper by ~20-25% there. Reach for it only where
  the partial-agg path can't protect the reducer: holistic aggregates
  (collect_list-style state), bounding per-reducer memory explicitly, or
  porting a pipeline from an engine without map-side combine.
- ``replicated_skew_join``: equi-join where the build side is too big to
  broadcast and the probe side has hot keys — replicate each build row to
  every salt bucket and salt the probe rows, so a hot key's rows spread
  over ``n_salts`` reducers instead of one.

Both are plain DataFrame compositions — no RDDs, fully Catalyst-visible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Measured (r06, PLANS.md skew section): replicated_skew_join wall-clock
# improves monotonically with salt count on a 50%-hot-key frame (18.9 s
# plain -> 6.8 s @8 -> 5.1 s @32 at 20M rows); the build side is replicated
# n_salts-fold, so this default assumes a small-but-above-broadcast build.
# At cluster scale set n_salts ~ executor-core count.
DEFAULT_SALTS = 32


def _salt_col(n_salts: int, *cols: str) -> Column:
    """Deterministic salt derived from row content (not rand(): replayable,
    and retries of a failed task produce identical output)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = DEFAULT_SALTS,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column -> 'sum(expr)' style spec with one of
    sum/count/min/max. Stage 1 groups by (keys, salt) — hot keys split
    across ``n_salts`` reducers; stage 2 merges the partials per key
    (counts merge by summing).
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    partial_cols, final_cols = [], []
    for out, spec in aggs.items():
        fn, _, inner = spec.partition("(")
        fn = fn.strip().lower()
        if fn not in merge_fn:
            raise ValueError(f"unsupported aggregate {fn!r} (need algebraic)")
        inner = inner.rstrip(")")
        partial_fn = F.count if fn == "count" else getattr(F, fn)
        partial_cols.append(partial_fn(F.expr(inner if fn != "count" else "*")).alias(f"_p_{out}"))
        final_cols.append(merge_fn[fn](f"_p_{out}").alias(out))

    salt_basis = salt_source or df.columns
    stage1 = (
        df.withColumn("_salt", _salt_col(n_salts, *salt_basis))
        .groupBy(*keys, "_salt")
        .agg(*partial_cols)
    )
    return stage1.groupBy(*keys).agg(*final_cols)


def replicated_skew_join(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
    probe_salt_source: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the build side replicated ``n_salts``x.

    Each probe row gets one deterministic salt; each build row is exploded
    to all salts; the join runs on (keys..., salt). A key with 10^9 probe
    rows lands on ``n_salts`` reducers instead of one. Use only when the
    build side can afford n_salts-fold replication (i.e., it is small-ish
    but above the broadcast threshold).
    """
    if how not in ("inner", "left"):
        raise ValueError("replicated_skew_join supports inner/left probe joins")
    salt_basis = probe_salt_source or probe.columns
    p = probe.withColumn("_salt", _salt_col(n_salts, *salt_basis))
    b = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return p.join(b, [*keys, "_salt"], how).drop("_salt")
