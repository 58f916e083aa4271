"""Count-min sketch over a key column — the sketch family's frequency
member (HLL distinct / GK quantiles / Bloom membership / freqItems heavy
hitters / CMS per-key counts), built ENTIRELY from native expressions.

The sketch IS a tiny DataFrame ``(depth, bucket, cnt)``: row j of the
standard CMS matrix (Cormode & Muthukrishnan 2005, "An improved data
stream summary: the count-min sketch and its applications") flattened to
rows, with ``cnt`` the sum of key weights mapping into (j, bucket). Build
is ONE combinable aggregation over exploded depth rows — map-side
partials shrink the shuffle to at most ``width x depth`` rows per
partition regardless of corpus size, the same scale shape as the bloom
bitmap's bit_or. Merge across sketches (or micro-batches) is union +
re-sum: counters are linear, so distributed/streaming maintenance is
exact — state is ``<= width x depth`` rows FOREVER, corpus-independent.

Estimates: ``cms_estimate`` joins a key frame against the broadcast
sketch on the (depth, bucket) probes and takes the min over depth —
never an underestimate (every counter an actual key's weight lands in
counts at least that weight), overcount bounded by ``e/width * N`` with
probability ``1 - (1/e)^depth`` per the standard analysis. Both bounds
are pinned in tests/test_llmops.py.

Hashing is the repo's portable Kirsch-Mitzenmacher base (the two 32-bit
halves of the key's 16-hex md5 prefix, probe j at ``(h1 + j*h2) % width``
— identical to llmops/bloom.py), so the sketch is DETERMINISTIC md5
arithmetic, not a per-run sample: the DuckDB twin recomputes the
identical counters and the driver hash pins the whole approximate
structure bit for bit (FOLDED_QUERIES ``cms_token_sketch``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _km_halves(key_col: Column) -> tuple[Column, Column]:
    """Portable double-hashing base: the two 32-bit halves of the key's
    16-hex md5 prefix as longs (same convention as llmops/bloom.py)."""
    key16 = F.substring(F.md5(key_col.cast("binary")), 1, 16)
    h1 = F.conv(F.substring(key16, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(key16, 9, 8), 16, 10).cast("long")
    return h1, h2


def _validate(width: int, depth: int) -> None:
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    if not 1 <= depth <= 16:
        raise ValueError(f"depth must be in [1, 16], got {depth}")


def cms_sketch(
    df: DataFrame,
    key_col: str = "key",
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: ``(depth, bucket, cnt)`` rows (absent bucket =
    zero counter). ``weight_col`` generalizes from counting occurrences
    to summing a non-negative per-row weight (e.g. bytes per key)."""
    _validate(width, depth)
    h1, h2 = _km_halves(F.col(key_col))
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = df.select(
        h1.alias("_h1"), h2.alias("_h2"), w.alias("_w"),
        F.explode(F.sequence(F.lit(1), F.lit(depth))).alias("depth"),
    )
    bucket = (F.col("_h1") + F.col("depth") * F.col("_h2")) % width
    return (
        rows.select("depth", bucket.alias("bucket"), "_w")
        .groupBy("depth", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Exact distributed merge: counters are linear, so the union re-sum
    equals the sketch of the concatenated inputs (pinned in tests)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("depth", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point estimates for a key frame: ``(key_col, est)`` with ``est`` =
    min over depth of the probed counters (missing counter = 0). The
    sketch is broadcast (<= width x depth rows by construction); the key
    side stays distributed — estimating a billion keys is one map-side
    broadcast join + a (key, depth)-combinable min."""
    _validate(width, depth)
    h1, h2 = _km_halves(F.col(key_col))
    probes = keys.select(key_col).distinct().select(
        key_col, h1.alias("_h1"), h2.alias("_h2"),
        F.explode(F.sequence(F.lit(1), F.lit(depth))).alias("depth"),
    ).withColumn("bucket", (F.col("_h1") + F.col("depth") * F.col("_h2")) % width)
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
