"""A broadcast Bloom filter built ENTIRELY from native Spark expressions —
no UDFs, no driver-side sketch object, no collect.

Why another membership structure: the classic scale upgrade for
"filter a huge stream by membership in a derived key set" (dup n-grams,
revoked ids, contaminated fingerprints) is to replace the corpus-scale
semi-join with a broadcast bloom test. Spark's built-in runtime row-level
filtering does this internally but exposes no reusable operator, and
``DataFrameStatFunctions.bloomFilter`` collects the sketch to the driver
and tests membership row-at-a-time in Python. This module keeps both
sides distributed and JVM-native:

- ``bloom_bitmap(keys, n_bits, k)`` — the filter IS a tiny DataFrame:
  ``(word_idx, bits)`` with ``bits`` = OR of ``1 << (pos % 63)`` over all
  key positions mapped into that word. Words carry 63 bits, not 64: a
  shift of 63 overflows a signed BIGINT in engines that check (DuckDB
  raises where Spark wraps), and capping at 62 keeps every expression
  portable. ~n_bits/63 rows total (a 2^20-bit filter = 16645 rows
  ~ 130 KiB — broadcast territory). Built with one combinable ``bit_or``
  aggregate over exploded positions.
- ``with_bloom_test(df, col, bitmap, ...)`` — k broadcast hash joins
  (one per probe position) + bit tests; entirely map-side, pipelines
  with the scan. A row passes iff ALL k probed bits are set.

Hashing is the Kirsch-Mitzenmacher double-hashing scheme over a PORTABLE
base: the two 32-bit halves of the key's 16-hex md5 prefix, probe i at
``(h1 + i*h2) mod n_bits``. Every step (md5, hex parse, modular
arithmetic, bit OR/AND) is replicable in any SQL engine, so operators
built on this bloom keep full DuckDB oracle hash checks — the filter is
deterministic, not a per-run sketch.

Guarantees: NO false negatives ever (a true member always passes); false
positives at the standard rate fp ~ (1 - e^(-k*n/m))^k — size
``n_bits >= 16 * n_keys`` for fp < 0.3% at k=4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _halves(key_col: Column) -> tuple[Column, Column]:
    """The two 32-bit halves of a 16-hex-char key as longs (the double-
    hashing base). Keys must be 16 hex chars (e.g. substring(md5(x),1,16),
    the repo's portable 64-bit key convention)."""
    h1 = F.conv(F.substring(key_col, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(key_col, 9, 8), 16, 10).cast("long")
    return h1, h2


def probe_positions(key_col: Column, n_bits: int, k: int) -> list[Column]:
    """The k probe bit-positions for a key: (h1 + i*h2) mod n_bits,
    i = 1..k (i starts at 1 so h2 always contributes; h2=0 keys
    degenerate to one position, which only raises their fp rate)."""
    h1, h2 = _halves(key_col)
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(1, k + 1)]


def bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Build the bitmap frame ``(word_idx long, bits long)`` from a key
    frame. One explode (k rows per key) + one combinable bit_or groupBy —
    the build side is usually already the output of an aggregation
    (e.g. "grams with doc_count >= 2"), so this adds only a tiny shuffle
    of at most ~n_bits/63 groups."""
    pos = F.explode(F.array(*probe_positions(F.col(key_col), n_bits, k)))
    return (
        keys.select(pos.alias("_pos"))
        .select(
            F.floor(F.col("_pos") / 63).cast("long").alias("word_idx"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.pmod(F.col("_pos"), F.lit(63)).cast("int"),
            ).alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("bits"))
    )


def with_bloom_test(
    df: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    n_bits: int = 1 << 20,
    k: int = 4,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Append ``out_col`` (boolean): true iff ALL k probed bits are set.

    The bitmap frame is packed into ONE map<word_idx, bits> row and
    broadcast-crossJoined, so membership is pure expression indexing
    (``element_at`` + bit AND) — no join per probe (a k-join formulation
    replicates the whole bitmap-build subtree k times in the plan), and
    the probed stream never shuffles. Missing words test as 0, so an
    empty filter rejects everything."""
    packed = bitmap.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "bits"))
        ).alias("_bloom_map")
    )
    cond = F.lit(True)
    for pos in probe_positions(F.col(key_col), n_bits, k):
        word = F.floor(pos / 63).cast("long")
        bit = F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            F.pmod(pos, F.lit(63)).cast("int"),
        )
        cond = cond & (
            F.coalesce(
                F.element_at(F.col("_bloom_map"), word), F.lit(0)
            ).bitwiseAND(bit)
            != 0
        )
    return (
        df.crossJoin(F.broadcast(packed))
        .withColumn(out_col, cond)
        .drop("_bloom_map")
    )
