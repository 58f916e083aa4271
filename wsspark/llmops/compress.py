"""Compression-ratio quality signal — the classic cheap repetition /
degenerate-text detector for corpus curation (boilerplate, scraped spam,
and template farms compress far below natural prose; near-random noise
doesn't compress at all). Corpus recipes gate on it because it catches
repetition at EVERY granularity in one number, where n-gram rules need a
grain per pattern length.

Engine shape: this is one of the repo's few justified Python boundaries
(alongside media decoding, BPE encode, and PCA moments): DEFLATE is not
expressible as Catalyst expressions, so the op runs as an Arrow-batched
``mapInPandas`` — partition-local, zero shuffles, streaming batches of
text through zlib with only (id, three ints/doubles) coming back. At
100 TB it is a map-only scan that parallelizes perfectly; the payload
text never leaves the JVM except as Arrow buffers to the colocated
worker.

No SQL twin exists (DuckDB has no DEFLATE), so correctness is pinned in
pytest: exact equality against a direct zlib loop over the same rows,
plus the ordering properties that make the signal useful (repeated
template << natural prose << random bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-doc DEFLATE stats: ``(id, n_bytes, n_zbytes, zratio)`` where
    ``zratio = n_zbytes / n_bytes`` (NULL for empty/NULL text — an empty
    doc has no meaningful ratio and callers filter it on length anyway).
    Low ratio = repetitive/templated; ~0.3-0.6 = natural prose; ~1 =
    incompressible. ``level`` is the zlib level (6 = zlib default;
    ratios are deterministic for a fixed level and zlib build)."""
    if not 1 <= int(level) <= 9:
        raise ValueError(f"level must be 1..9, got {level}")
    id_field = docs.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, id_field.nullable),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("n_zbytes", T.IntegerType()),
            T.StructField("zratio", T.DoubleType()),
        ]
    )
    lvl = int(level)

    def _batches(it):
        import zlib

        import pandas as pd

        for pdf in it:
            raw = [
                (t if isinstance(t, str) else "").encode("utf-8")
                for t in pdf[text_col]
            ]
            n = [len(b) for b in raw]
            z = [len(zlib.compress(b, lvl)) for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n,
                    "n_zbytes": z,
                    "zratio": [
                        (zi / ni) if ni else None for zi, ni in zip(z, n)
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(_batches, out_schema)


def repetition_gate(
    docs: DataFrame,
    max_ratio: float = 1.0,
    min_ratio: float = 0.25,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Keep docs whose compression ratio sits in the natural-text band:
    below ``min_ratio`` = degenerate repetition/template, above
    ``max_ratio`` = incompressible noise (binary paste, encoded blobs).
    Implemented as a broadcast-free semi-join of the payload against the
    map-only stats frame on the id — the payload never re-serializes
    through Python."""
    stats = compression_ratio(docs, text_col=text_col, id_col=id_col, level=level)
    keep = stats.filter(
        F.col("zratio").isNotNull()
        & (F.col("zratio") >= float(min_ratio))
        & (F.col("zratio") <= float(max_ratio))
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")
