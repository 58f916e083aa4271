"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (image/audio codecs are not available in
this environment — see ``decode_image_stub``): it produces a deterministic
fake feature vector from the bytes so the Spark-side contract — schema,
batching, partitioning, UDF signature — is real and fully tested. Swapping
in PIL/librosa/ffmpeg is a one-function change inside the mapInPandas body;
the dataflow (scan -> repartition -> Arrow batches -> struct output) is what
matters at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)

FEATURE_DIM = 8


def _make_decode_stub(feature_dim: int):
    """Build the decode closure OUTSIDE module scope: the returned function
    has a non-resolvable qualname, so cloudpickle serializes it by VALUE
    into the mapInPandas task. Executors therefore never need the wsspark
    package on their PYTHONPATH — the task is self-contained, which is how
    a UDF should ship to a 1000-executor cluster."""
    import hashlib as _hashlib

    def decode(payload):
        """Deterministic fake 'decode + feature extract': digest bytes into
        a fixed-dim vector. Replace with a real codec (PIL / torchvision) in
        production — signature and output shape stay identical. Raises
        NotImplementedError for payloads tagged as real codecs we cannot
        decode here, making the stub boundary explicit."""
        if payload is None:
            return None
        if bytes(payload[:4]) in (b"\x89PNG", b"\xff\xd8\xff\xe0"):
            raise NotImplementedError(
                "real image decoding requires PIL/opencv, not available in this env"
            )
        digest = _hashlib.sha256(bytes(payload)).digest()
        return [digest[i] / 255.0 for i in range(feature_dim)]

    return decode


decode_image_stub = _make_decode_stub(FEATURE_DIM)


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas pass over binary payloads -> feature vectors.

    Arrow ships columnar batches to Python; each batch is processed
    vectorized-per-row but with zero per-row Python<->JVM crossings. For
    skew (few huge videos per partition) repartition upstream by
    ``media_id`` so batches stay balanced.
    """

    # Bind the decoder as a local: the nested _extract then closes over a
    # by-value-picklable function, never over this module.
    decode = _make_decode_stub(FEATURE_DIM)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "feature": pdf["payload"].map(decode),
                }
            )
            yield out

    cols = ["media_id", "media_type", "payload"]
    return media.select(*cols).mapInPandas(_extract, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plumbing* for video rows: computes deterministic frame
    timestamps from metadata natively (sequence + explode); the actual frame
    decode would join this against ``extract_features`` output. No Python
    needed for the sampling plan itself."""
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms")
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("target_w", LongType(), False),
        StructField("target_h", LongType(), False),
        StructField("resized", BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize *plumbing* over image rows: Arrow-batched mapInPandas with the
    decode/resize/encode step stubbed (no codec libs in this environment —
    the stub emits a deterministic tag + original bytes so the dataflow,
    schema, and batch shape are real and testable; swap the body for
    PIL.Image.resize in production)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"RESIZED[{target_w}x{target_h}]".encode()

        def stub(payload):
            if payload is None:
                return None
            if bytes(payload[:4]) in (b"\x89PNG", b"\xff\xd8\xff\xe0"):
                raise NotImplementedError(
                    "real image resize requires PIL/opencv, not available in this env"
                )
            return tag + bytes(payload)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "resized": pdf["payload"].map(stub),
                }
            )

    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "payload")
        .mapInPandas(_resize, RESIZED_SCHEMA)
    )
