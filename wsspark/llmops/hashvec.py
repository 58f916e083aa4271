"""Feature hashing (the "hashing trick") — train-free document vectors.

`llmops.similarity` / `srp` / `pq` all assume an embedding column already
exists. This module produces one WITHOUT a model or a vocabulary: each
token hashes straight to one of ``dim`` buckets with a +/-1 sign from an
independent hash bit (Weinberger et al. 2009 — the signed sum makes
collisions cancel in expectation instead of biasing upward), per-doc
bucket sums are l2-normalized, done. No vocabulary build, no broadcast
dictionary, no training pass — the vectorizer is STATELESS, so it
parallelizes trivially and never needs refitting as the corpus grows;
the price is collision noise, which shrinks as ``dim`` grows.

Scale shape: explode tokens (map-side), ONE keyed aggregation to
(doc, bucket) partial sums — map-side combinable, at most ``dim`` rows
per doc survive — then a doc-keyed assembly into the dense array. All
native expressions (md5/conv/map_from_entries/transform); no Python.

Determinism/oracle: the bucket is ``dedup.portable_hash64 % dim`` (the
repo's 60-bit md5-prefix convention) and the sign is the PARITY OF THE
16th HEX CHAR of the same md5 — deliberately outside the 15-char bucket
prefix, so sign and bucket are independent bits of one digest, and both
are one-line DuckDB expressions. A DuckDB twin recomputes the full
sparse vector bit-for-bit (integer signed counts; the l2 norm is a sqrt
of the same integer in both engines, so even the normalized doubles
match exactly).

The output feeds the existing vector ladder unchanged: brute-force /
IVF / SRP cosine over ``vec`` — nearest-neighbor text search with zero
model dependencies (pinned in tests: exact duplicate text -> cosine 1,
token-overlap pairs rank above disjoint ones).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wsspark.llmops.dedup import portable_hash64
from wsspark.llmops.textstats import tokens


def _sign(tok: Column) -> Column:
    """+1/-1 from the 16th hex char's parity of md5(token) — independent
    of the 15-char bucket prefix. DuckDB twin:
    ``CASE WHEN ('0x' || substr(md5(t), 16, 1))::BIGINT % 2 = 1
    THEN 1 ELSE -1 END``."""
    nib = F.conv(F.substring(F.md5(tok.cast("binary")), 16, 1), 16, 10).cast("long")
    return F.when(nib % 2 == 1, F.lit(1)).otherwise(F.lit(-1))


def hashed_vector_entries(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The sparse form: (id, bucket, weight) with zero-sum buckets dropped
    and weights l2-normalized per doc — the oracle-able surface (every
    value is deterministic integer arithmetic + one sqrt)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    tok = F.explode(tokens(text_col)).alias("tok")
    hashed = docs.select(F.col(id_col), tok).select(
        id_col,
        F.pmod(portable_hash64(F.col("tok")), F.lit(dim)).alias("bucket"),
        _sign(F.col("tok")).alias("sgn"),
    )
    acc = (
        hashed.groupBy(id_col, "bucket")
        .agg(F.sum("sgn").alias("v"))
        .filter(F.col("v") != 0)
    )
    norm = acc.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    return (
        acc.join(norm, id_col)
        .select(
            id_col,
            "bucket",
            (F.col("v").cast("double") / F.col("nrm")).alias("weight"),
        )
    )


def hashed_doc_vectors(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The dense form: (id, vec array<double> of length ``dim``,
    unit l2 norm) — drop-in input for the similarity/SRP/kmeans ladder."""
    entries = hashed_vector_entries(docs, dim, text_col, id_col)
    as_map = entries.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "weight"))
        ).alias("__m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("__m")[i], F.lit(0.0)),
    )
    return as_map.select(id_col, dense.alias("vec"))
