"""Audio near-dup fingerprinting — the AUDIO rung of the near-dup
ladder (text: MinHash; embeddings: IVF-cosine; images: pHash). The
constellation design from the audio-fingerprinting literature
(Wang 2003), simplified and fully deterministic:

framed |rFFT| (Hann) -> top-K spectral peaks per frame -> LANDMARKS =
(anchor bin, target bin, frame delta) triples within a small forward
window, packed into one integer each. A recording's fingerprint is its
landmark set; two recordings of the same material share a large
fraction of landmarks even under amplitude scaling and additive noise
(peak BINS survive what raw sample values do not), while unrelated
audio shares landmarks only by chance.

Scale shape: fingerprinting is one self-contained Arrow ``mapInPandas``
pass (closure pickled by value — executors never import wsspark).
Pairing is an INVERTED-INDEX join, never all-pairs: explode landmarks,
equi-join on the landmark value (bucketed by construction), count
shared landmarks per candidate pair, keep pairs at/above the floor.
Hyper-common landmarks (the 60 Hz hum problem — one landmark shared by
everything would quadratically explode its bucket) are dropped by a
``max_bucket_size`` cap BEFORE the self-join, same discipline as
minhash_dedup_pairs' boilerplate-bucket cap.

Reference scope: the reference engine processes no audio; this extends
the §2.12 dedup family to the audio modality the testdata models as
opaque binaries.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _make_audio_fp_fn(
    n_fft: int = 256,
    hop: int = 128,
    peaks_per_frame: int = 3,
    fanout: int = 3,
    window_frames: int = 16,
):
    """Self-contained fingerprint closure: ``fp(payload) -> list[int] |
    None`` (None = not a decodable 16-bit PCM WAV)."""
    from wsspark.llmops.multimodal import _make_wav_parser

    parse = _make_wav_parser()

    import numpy as np

    hann = 0.5 - 0.5 * np.cos(
        2.0 * np.pi * np.arange(n_fft) / n_fft
    )

    def fp(payload) -> list | None:
        if payload is None:
            return None
        try:
            wav = parse(bytes(payload))
        except NotImplementedError:
            return None  # honest codec boundary: not comparable here
        if wav is None:
            return None
        n_ch, _rate, samples = wav
        mono = np.asarray(samples[::n_ch], dtype=np.float64)
        if len(mono) < n_fft:
            return []
        n_frames = 1 + (len(mono) - n_fft) // hop
        peaks = []
        for t in range(n_frames):
            frame = mono[t * hop : t * hop + n_fft] * hann
            mag = np.abs(np.fft.rfft(frame))
            mag[0] = 0.0  # DC carries no melody
            # deterministic top-K: magnitude desc, bin asc on ties
            order = sorted(range(len(mag)), key=lambda b: (-mag[b], b))
            peaks.append([b for b in order[:peaks_per_frame] if mag[b] > 0])
        marks = set()
        for t, anchors in enumerate(peaks):
            for f1 in anchors:
                paired = 0
                for dt in range(1, window_frames + 1):
                    if paired >= fanout or t + dt >= n_frames:
                        break
                    for f2 in peaks[t + dt]:
                        if paired >= fanout:
                            break
                        # (f1, f2, dt) packed: bins < n_fft/2+1 < 2^9
                        marks.add((f1 << 18) | (f2 << 9) | dt)
                        paired += 1
        return sorted(marks)

    return fp


def audio_fingerprints(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    **fp_kwargs,
) -> DataFrame:
    """One Arrow pass: (id, landmarks array<long> | NULL). NULL = not a
    decodable PCM WAV; [] = decodable but too short to frame."""
    fp = _make_audio_fp_fn(**fp_kwargs)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "landmarks": pdf[payload_col].map(fp),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        _run, f"{id_col} long, landmarks array<long>"
    )


def audio_dup_pairs(
    fps: DataFrame,
    id_col: str = "media_id",
    landmarks_col: str = "landmarks",
    min_shared: int = 20,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Near-duplicate audio pairs sharing >= ``min_shared`` landmarks,
    via the inverted index (explode -> equi-join on landmark -> count
    per pair). Landmarks appearing in more than ``max_bucket_size``
    recordings are dropped before the join (hum/silence artifacts — a
    bucket that common identifies nothing and would explode
    quadratically). Returns (id_a, id_b, n_shared), id_a < id_b."""
    inv = fps.filter(F.col(landmarks_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.explode(landmarks_col).alias("mark"),
    )
    # cap the bucket BEFORE the self-join: count per landmark is one
    # map-side-combinable aggregation, and the anti-filter is a broadcast
    # of only the (rare) over-cap marks
    hot = (
        inv.groupBy("mark")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > max_bucket_size)
        .select("mark")
    )
    cold = inv.join(F.broadcast(hot), "mark", "left_anti")
    left = cold.select(F.col("_id").alias("id_a"), "mark")
    right = cold.select(F.col("_id").alias("id_b"), "mark")
    return (
        left.join(right, "mark")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
