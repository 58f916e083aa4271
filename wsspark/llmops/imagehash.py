"""Perceptual image hashing + Hamming-banded near-dup pairing — the
IMAGE rung of the near-dup ladder (text has MinHash/SimHash/prefix
filters, embeddings have IVF-cosine; pixels get pHash).

pHash (DCT perceptual hash, the classic from the photo-dedup
literature): decode -> luminance -> block-mean downsample to 32x32 ->
2-D DCT-II -> threshold the 8x8 low-frequency block against its median
-> 64-bit signature. Invariant to brightness/contrast shifts and
compression noise (they move the median with the coefficients),
sensitive to structure — near-duplicate photos land within a few bits,
unrelated ones near the 32-bit random-expectation distance.

Scale shape: hashing is one Arrow ``mapInPandas`` pass (the decode
closure is cloudpickled BY VALUE, same self-contained-task discipline
as multimodal.extract_features — executors never import wsspark);
pairing is banded, never all-pairs: the 64-bit hash splits into
``bands`` equal bit-slices, candidates are an equi-join on (band index,
band value) — by pigeonhole, two hashes within Hamming distance d < bands
MUST agree on at least one full band, so recall is 100% (lossless) for
``max_distance < bands``; the verify step is a native
``bit_count(a XOR b)`` filter, zero Python. The same
band -> bucket -> verify architecture as dedup.minhash_dedup_pairs, so
the 100 TB argument carries over verbatim.

Reference scope: the reference engine processes no images; this extends
the training-data dedup family (SURVEY §2.12) to the multimodal columns
the testdata models as opaque binaries.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PHASH_BITS = 64
_GRID = 32  # downsample grid; DCT keeps the 8x8 low-frequency corner


def _make_phash_fn():
    """Self-contained pHash closure (by-value pickling — see module doc).
    Returns ``phash(payload) -> int | None``: None for undecodable
    payloads (they cannot be perceptually compared; hash-exact dedup
    still covers them), a signed 64-bit int otherwise."""
    from wsspark.llmops.multimodal import _make_pixel_parser

    parse = _make_pixel_parser()

    import math

    import numpy as np

    # DCT-II basis for the 32-point transform, orthonormal scaling
    n = _GRID
    basis = np.array(
        [
            [
                math.cos(math.pi * (2 * x + 1) * u / (2 * n))
                * (math.sqrt(1 / n) if u == 0 else math.sqrt(2 / n))
                for x in range(n)
            ]
            for u in range(n)
        ]
    )

    def phash(payload) -> int | None:
        if payload is None:
            return None
        img = parse(bytes(payload))
        if img is None:
            return None
        w, h, rgb = img
        px = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
        gray = (
            0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
        )
        # block-mean resample to the fixed grid (deterministic, no
        # interpolation kernel to disagree about across platforms)
        ys = (np.arange(n + 1) * h) // n
        xs = (np.arange(n + 1) * w) // n
        small = np.empty((n, n))
        for i in range(n):
            y0, y1 = ys[i], max(ys[i] + 1, ys[i + 1])
            for j in range(n):
                x0, x1 = xs[j], max(xs[j] + 1, xs[j + 1])
                small[i, j] = gray[y0:y1, x0:x1].mean()
        coef = basis @ small @ basis.T
        low = coef[:8, :8].flatten()
        # classic pHash: drop the DC term (pure brightness) from the
        # median so a constant shift cannot flip the signature
        med = float(np.median(low[1:]))
        bits = 0
        for k, v in enumerate(low):
            if k == 0:
                continue  # DC excluded from the signature too
            bits = (bits << 1) | (1 if v > med else 0)
        bits <<= 1  # keep the width at 64 (63 AC bits + 1 zero pad)
        return bits - (1 << 64) if bits >= (1 << 63) else bits

    return phash


def phash_images(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """One Arrow pass: (id, phash long | NULL). NULL = payload not
    decodable by the from-spec parsers (see multimodal) — perceptual
    comparison is undefined there, so those rows are excluded rather
    than hashed on raw bytes (byte-exact dedup already covers them)."""
    phash = _make_phash_fn()

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "phash": pdf[payload_col].map(phash).astype("Int64"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        _hash, f"{id_col} long, phash long"
    )


def phash_dup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_distance: int = 10,
    bands: int = 16,
) -> DataFrame:
    """Near-duplicate image pairs at Hamming distance <= ``max_distance``
    over 64-bit pHashes, banded (never all-pairs): candidates share at
    least one of ``bands`` equal bit-slices — pigeonhole makes recall
    EXACTLY 100% while ``max_distance < bands`` (validated); precision
    comes from the native ``bit_count(XOR)`` verify. Returns
    (id_a, id_b, hamming), id_a < id_b, deduplicated."""
    if not 1 <= bands <= PHASH_BITS or PHASH_BITS % bands:
        raise ValueError(f"bands must divide {PHASH_BITS}, got {bands}")
    if max_distance >= bands:
        raise ValueError(
            f"max_distance={max_distance} >= bands={bands} breaks the "
            "pigeonhole recall guarantee — raise bands (narrower slices) "
            "or lower the distance"
        )
    width = PHASH_BITS // bands
    mask = (1 << width) - 1
    h = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
    )
    banded = h.select(
        "_id",
        "_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("_h", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("e"),
    ).select("_id", "_h", "e.band", "e.val")
    left = banded.select(
        F.col("_id").alias("id_a"),
        F.col("_h").alias("h_a"),
        "band",
        "val",
    )
    right = banded.select(
        F.col("_id").alias("id_b"),
        F.col("_h").alias("h_b"),
        "band",
        "val",
    )
    return (
        left.join(right, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("h_a").bitwiseXOR(F.col("h_b"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
        .distinct()
    )


def video_phash_frames(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-frame pHash over Motion-JPEG AVI payloads: one Arrow pass
    emitting (id, frame_idx, phash) — video near-dup reduces to the
    image machinery, one row per frame (the same reduction the
    video-dedup literature uses: a video IS its keyframe signature
    sequence). Non-AVI payloads and undecodable frames are skipped;
    ``frame_idx`` preserves temporal order for sequence-aware scoring."""
    from wsspark.llmops.multimodal import _make_avi_parser

    parse_avi = _make_avi_parser()
    phash = _make_phash_fn()

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    avi = parse_avi(bytes(payload))
                except NotImplementedError:
                    continue  # non-MJPG codec: honest boundary
                if avi is None:
                    continue
                _w, _h, _uspf, frames = avi
                for i, fb in enumerate(frames):
                    hv = phash(fb)
                    if hv is None:
                        continue
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(hv)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="Int64"),
                 "frame_idx": pd.Series(idxs, dtype="Int64"),
                 "phash": pd.Series(hashes, dtype="Int64")}
            )

    return media.select(id_col, payload_col).mapInPandas(
        _run, f"{id_col} long, frame_idx long, phash long"
    )


def video_dup_pairs(
    frames: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_distance: int = 6,
    bands: int = 8,
    min_shared_frames: int = 3,
) -> DataFrame:
    """Near-duplicate VIDEO pairs: frame-level pHash candidates via the
    same Hamming banding as ``phash_dup_pairs`` (pigeonhole-lossless for
    ``max_distance < bands``), then videos pair when >=
    ``min_shared_frames`` DISTINCT frame positions of one match frames
    of the other. Returns (id_a, id_b, n_shared_frames), id_a < id_b.
    Inverted-index shape throughout — never all-pairs on videos or
    frames."""
    if not 1 <= bands <= PHASH_BITS or PHASH_BITS % bands:
        raise ValueError(f"bands must divide {PHASH_BITS}, got {bands}")
    if max_distance >= bands:
        raise ValueError(
            f"max_distance={max_distance} >= bands={bands} breaks the "
            "pigeonhole recall guarantee"
        )
    width = PHASH_BITS // bands
    mask = (1 << width) - 1
    f = frames.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("_vid"),
        F.col("frame_idx").alias("_fi"),
        F.col(hash_col).alias("_h"),
    )
    banded = f.select(
        "_vid",
        "_fi",
        "_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("_h", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("e"),
    ).select("_vid", "_fi", "_h", "e.band", "e.val")
    left = banded.select(
        F.col("_vid").alias("id_a"),
        F.col("_fi").alias("fi_a"),
        F.col("_h").alias("h_a"),
        "band",
        "val",
    )
    right = banded.select(
        F.col("_vid").alias("id_b"),
        F.col("_fi").alias("fi_b"),
        F.col("_h").alias("h_b"),
        "band",
        "val",
    )
    matched = (
        left.join(right, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
            <= max_distance
        )
        .select("id_a", "id_b", "fi_a", "fi_b")
        .distinct()
    )
    return (
        matched.groupBy("id_a", "id_b")
        .agg(F.count_distinct("fi_a").alias("n_shared_frames"))
        .filter(F.col("n_shared_frames") >= min_shared_frames)
    )
