"""Audio constellation fingerprints: noise/amplitude invariance,
melody discrimination, inverted-index pairing vs the set-intersection
oracle, hot-landmark capping."""

from __future__ import annotations

import math
import random
import struct

from pyspark.sql import functions as F

from wsspark.llmops import audiofp


def make_wav(samples, n_ch=1, rate=8000):
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _melody(freqs, n=8000, rate=8000, amp=9000, seed=None, noise=0):
    """Concatenated tones (a 'melody'); optional additive noise."""
    rng = random.Random(seed or 0)
    seg = n // len(freqs)
    out = []
    for f in freqs:
        for i in range(seg):
            v = amp * math.sin(2 * math.pi * f * i / rate)
            if noise:
                v += rng.gauss(0, noise)
            out.append(max(-32768, min(32767, int(v))))
    return out


MELODY_A = [440, 660, 550, 880, 440, 770]
MELODY_B = [523, 392, 698, 466, 622, 349]


def test_fingerprint_invariance_and_discrimination():
    fp = audiofp._make_audio_fp_fn()
    a = set(fp(make_wav(_melody(MELODY_A))))
    a_noisy = set(
        fp(make_wav(_melody(MELODY_A, amp=6000, noise=300, seed=7)))
    )
    b = set(fp(make_wav(_melody(MELODY_B))))
    assert len(a) > 50
    # same melody under amplitude scaling + noise: high overlap
    assert len(a & a_noisy) / len(a | a_noisy) > 0.5
    # different melody: far (not near-zero — pure test tones quantize
    # into neighboring bins at 31.25 Hz/bin, so some landmark collisions
    # are physical; measured 0.18 vs 0.59 for the noisy twin)
    assert len(a & b) / len(a | b) < 0.3
    assert fp(b"\x00not audio") is None
    assert fp(None) is None
    assert fp(make_wav([0] * 10)) == []  # too short to frame


def test_audio_dup_pairs_matches_intersection_oracle(spark):
    rows = []
    for s in range(6):
        freqs = [300 + 50 * ((s * 7 + k) % 11) for k in range(6)]
        rows.append((s * 2, make_wav(_melody(freqs))))
        rows.append(
            (s * 2 + 1, make_wav(_melody(freqs, amp=7000, noise=250, seed=s)))
        )
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    fps = audiofp.audio_fingerprints(media)
    marks = {r.media_id: set(r.landmarks) for r in fps.collect()}
    t = 20
    expect = {
        (i, j): len(marks[i] & marks[j])
        for i in marks
        for j in marks
        if i < j and len(marks[i] & marks[j]) >= t
    }
    assert all((s * 2, s * 2 + 1) in expect for s in range(6))  # twins pair
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in audiofp.audio_dup_pairs(
            fps, min_shared=t, max_bucket_size=100
        ).collect()
    }
    assert got == expect  # inverted index == set-intersection oracle


def test_hot_landmark_cap_drops_universal_marks(spark):
    """A landmark present in EVERY row (the hum pathology) is excluded
    before the self-join: with the cap below row count, pairs driven
    only by that mark vanish."""
    hum = 12345
    rows = [(i, [hum, 100 + i]) for i in range(30)]
    fps = spark.createDataFrame(rows, "media_id long, landmarks array<long>")
    out = audiofp.audio_dup_pairs(
        fps, min_shared=1, max_bucket_size=10
    ).collect()
    assert out == []  # only the capped hum was shared
    # raise the cap: the hum mark now pairs everything
    out2 = audiofp.audio_dup_pairs(fps, min_shared=1, max_bucket_size=50)
    assert out2.count() == 30 * 29 // 2
