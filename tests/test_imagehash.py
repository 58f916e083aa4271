"""Perceptual pHash: invariance to brightness shifts, sensitivity to
structure, banded pairing losslessness vs the brute-force oracle."""

from __future__ import annotations

import random
import struct

import pytest
from pyspark.sql import functions as F

from wsspark.llmops import imagehash


def make_bmp(pixels):
    """Rows of (r, g, b) tuples -> bottom-up 24-bit BI_RGB BMP (same
    encoder as test_multimodal)."""
    h, w = len(pixels), len(pixels[0])
    stride = (w * 3 + 3) & ~3
    data = bytearray()
    for row in reversed(pixels):
        rb = bytearray()
        for r, g, b in row:
            rb += bytes((b, g, r))
        rb += b"\x00" * (stride - len(rb))
        data += rb
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    header += struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(data)


def _img(seed, w=64, h=48):
    rng = random.Random(seed)
    base = [[rng.randint(0, 255) for _ in range(w)] for _ in range(h)]
    # smooth: average neighborhoods so the image has STRUCTURE (pHash is
    # a low-frequency signature; iid noise has none)
    sm = [
        [
            sum(
                base[min(h - 1, max(0, y + dy))][min(w - 1, max(0, x + dx))]
                for dy in (-2, -1, 0, 1, 2)
                for dx in (-2, -1, 0, 1, 2)
            )
            // 25
            for x in range(w)
        ]
        for y in range(h)
    ]
    return [[(v, v, v) for v in row] for row in sm]


def _brighten(pixels, delta):
    return [
        [tuple(min(255, c + delta) for c in px) for px in row]
        for row in pixels
    ]


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_invariance_and_discrimination():
    phash = imagehash._make_phash_fn()
    a = phash(make_bmp(_img(1)))
    a_bright = phash(make_bmp(_brighten(_img(1), 25)))
    b = phash(make_bmp(_img(2)))
    assert a is not None and b is not None
    assert _ham(a, a_bright) <= 6  # brightness shift: near-dup
    assert _ham(a, b) >= 20  # unrelated structure: far
    assert phash(b"\x00not an image") is None
    assert phash(None) is None


def test_phash_dup_pairs_banded_matches_bruteforce(spark):
    imgs = []
    for s in range(12):
        imgs.append((s * 2, make_bmp(_img(s))))
        imgs.append((s * 2 + 1, make_bmp(_brighten(_img(s), 20))))
    media = spark.createDataFrame(imgs, "media_id long, payload binary")
    hashes = imagehash.phash_images(media)
    hmap = {r.media_id: r.phash for r in hashes.collect()}
    assert len(hmap) == 24 and all(v is not None for v in hmap.values())
    d = 10
    expect = {
        (i, j)
        for i in hmap
        for j in hmap
        if i < j and _ham(hmap[i], hmap[j]) <= d
    }
    # every planted (even, odd) twin must be a true near-dup pair
    assert all((s * 2, s * 2 + 1) in expect for s in range(12))
    got = {
        (r.id_a, r.id_b)
        for r in imagehash.phash_dup_pairs(
            hashes, max_distance=d, bands=16
        ).collect()
    }
    assert got == expect  # banding is LOSSLESS at d < bands
    # hamming values are exact
    for r in imagehash.phash_dup_pairs(hashes, max_distance=d).collect():
        assert r.hamming == _ham(hmap[r.id_a], hmap[r.id_b])


def test_phash_dup_pairs_validation(spark):
    df = spark.createDataFrame([(1, 0)], "media_id long, phash long")
    with pytest.raises(ValueError, match="divide"):
        imagehash.phash_dup_pairs(df, bands=7)
    with pytest.raises(ValueError, match="pigeonhole"):
        imagehash.phash_dup_pairs(df, max_distance=16, bands=16)


def test_phash_plan_is_native(spark):
    """The pairing plan carries no Python: banding, join, XOR popcount
    and the distance filter are all JVM-side."""
    df = spark.createDataFrame(
        [(i, i * 7919) for i in range(50)], "media_id long, phash long"
    )
    plan = (
        imagehash.phash_dup_pairs(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_video_frame_hashing_and_pairing(spark):
    """Video near-dup: per-frame pHash over MJPEG AVIs; two videos pair
    when enough frame positions match within the Hamming floor. A
    re-encoded copy (same frames) pairs; a different clip does not."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).parent))
    from test_multimodal import make_avi, make_jpeg

    from wsspark.llmops import imagehash

    def clip(seed, n_frames=4, w=16, h=16):
        frames = []
        for k in range(n_frames):
            px = _img(seed * 100 + k, w=w, h=h)
            frames.append(make_jpeg(px))
        return make_avi(frames, w, h)

    media = spark.createDataFrame(
        [
            (0, clip(1)),
            (1, clip(1)),  # identical re-wrap: every frame matches
            (2, clip(2)),  # unrelated clip
            (3, b"\x00not a video"),
        ],
        "media_id long, payload binary",
    )
    frames = imagehash.video_phash_frames(media)
    per_vid = (
        frames.groupBy("media_id").count().orderBy("media_id").collect()
    )
    assert [(r.media_id, r["count"]) for r in per_vid] == [
        (0, 4), (1, 4), (2, 4),
    ]
    pairs = {
        (r.id_a, r.id_b): r.n_shared_frames
        for r in imagehash.video_dup_pairs(
            frames, max_distance=6, bands=8, min_shared_frames=3
        ).collect()
    }
    assert pairs.get((0, 1)) == 4
    assert (0, 2) not in pairs and (1, 2) not in pairs
    import pytest

    with pytest.raises(ValueError, match="pigeonhole"):
        imagehash.video_dup_pairs(frames, max_distance=8, bands=8)
