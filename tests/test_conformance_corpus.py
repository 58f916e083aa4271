"""Fixed-byte decoder conformance corpus: payloads produced ONCE by an
independent encoder implementation (JDK 17 javax.imageio /
javax.sound.sampled — tools/GenConformance.java) and checked in as bytes,
so decoder correctness no longer depends on the test-side Python encoders
(which round 7 proved can themselves be wrong — the progressive-JPEG ZRL
flush bug).

Expected values:
- lossless formats (PNG / BMP / GIF / WAV): the exact deterministic source
  raster/samples the generator encoded (``*.src`` raw bytes, tol 0);
- JPEG (lossy): ImageIO's OWN decode of the written payload — an
  independent-DECODER reference — with a small tolerance for IDCT and
  chroma-upsampling implementation differences between ImageIO and the
  from-spec Python decoder.
"""

from __future__ import annotations

import json
import os
import struct

import pytest

from wsspark.llmops import multimodal

CORPUS = os.path.join(os.path.dirname(__file__), "fixtures", "conformance")

# manifest.json = the round-8 corpus (tools/GenConformance.java);
# manifest2.json = the round-9 extension (tools/GenConformance2.java:
# interlaced/16-bit/palette PNG, PPM, animated GIF disposal, IMA-ADPCM
# WAV with an independent Java from-spec decode as the reference, and a
# spec-assembled AVI-MJPEG container).
MANIFEST = []
for _name in ("manifest.json", "manifest2.json"):
    _p = os.path.join(CORPUS, _name)
    if os.path.exists(_p):
        with open(_p) as _f:
            MANIFEST += json.load(_f)


def _load(name: str) -> bytes:
    with open(os.path.join(CORPUS, name), "rb") as f:
        return f.read()


def _ids(entries):
    return [e["file"] for e in entries]


PIXEL = [e for e in MANIFEST if e["kind"] == "pixel"]
GIF = [e for e in MANIFEST if e["kind"] == "gif"]
GIF_ANIM = [e for e in MANIFEST if e["kind"] == "gif_anim"]
WAV = [e for e in MANIFEST if e["kind"] == "wav"]
AVI = [e for e in MANIFEST if e["kind"] == "avi"]


@pytest.mark.parametrize("entry", PIXEL, ids=_ids(PIXEL))
def test_pixel_decoder_conformance(entry):
    parse = multimodal._make_pixel_parser()
    got = parse(_load(entry["file"]))
    assert got is not None, entry["file"]
    w, h, rgb = got
    assert (w, h) == (entry["w"], entry["h"])
    want = _load(entry["src"])
    assert len(rgb) == len(want) == w * h * 3
    diffs = [abs(a - b) for a, b in zip(rgb, want)]
    assert max(diffs) <= entry["tol"], (entry["file"], max(diffs))
    if entry["tol"]:
        # lossy formats additionally bound MEAN error: per-pixel tolerance
        # absorbs residual IDCT rounding, but a systematic decode bug
        # can't stay under a tight mean. Measured: 0.03 worst mean on
        # this corpus with libjpeg-parity fancy upsampling.
        assert sum(diffs) / len(diffs) <= 1.0, entry["file"]


@pytest.mark.parametrize("entry", GIF, ids=_ids(GIF))
def test_gif_decoder_conformance(entry):
    parse = multimodal._make_gif_parser()
    got = parse(_load(entry["file"]))
    assert got is not None, entry["file"]
    w, h, frames = got
    assert (w, h) == (entry["w"], entry["h"])
    assert len(frames) == 1
    assert bytes(frames[0][1]) == _load(entry["src"])


@pytest.mark.parametrize("entry", WAV, ids=_ids(WAV))
def test_wav_decoder_conformance(entry):
    parse = multimodal._make_wav_parser()
    got = parse(_load(entry["file"]))
    assert got is not None, entry["file"]
    n_ch, rate, samples = got
    assert n_ch == entry["w"]  # manifest reuses w = channels for wav
    assert rate == 8000
    raw = _load(entry["src"])
    want = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    assert list(samples) == want


@pytest.mark.parametrize("entry", GIF_ANIM, ids=_ids(GIF_ANIM))
def test_gif_animation_disposal_conformance(entry):
    """Composited canvases must match the GIF89a compositing definition
    applied by the generator (doNotDispose accumulation + restore-to-
    background on the frame rect), frame for frame, byte for byte."""
    parse = multimodal._make_gif_parser()
    got = parse(_load(entry["file"]))
    assert got is not None, entry["file"]
    w, h, frames = got
    assert (w, h) == (entry["w"], entry["h"])
    assert len(frames) == entry["frames"]
    want = _load(entry["src"])
    fsize = w * h * 3
    assert len(want) == fsize * entry["frames"]
    for i, (delay_ms, rgb) in enumerate(frames):
        assert delay_ms >= 0
        assert bytes(rgb) == want[i * fsize : (i + 1) * fsize], f"frame {i}"


@pytest.mark.parametrize("entry", AVI, ids=_ids(AVI))
def test_avi_mjpeg_conformance(entry):
    """Container parse (spec-assembled RIFF, MJPG vids stream) + per-frame
    JPEG decode against ImageIO's own decode of the embedded frames."""
    parse_avi = multimodal._make_avi_parser()
    got = parse_avi(_load(entry["file"]))
    assert got is not None, entry["file"]
    w, h, us_per_frame, frames = got
    assert (w, h) == (entry["w"], entry["h"])
    assert us_per_frame > 0
    assert len(frames) == entry["frames"]
    parse_px = multimodal._make_pixel_parser()
    want = _load(entry["src"])
    fsize = w * h * 3
    for i, fb in enumerate(frames):
        dec = parse_px(bytes(fb))
        assert dec is not None, f"frame {i}"
        fw, fh, rgb = dec
        assert (fw, fh) == (w, h)
        ref = want[i * fsize : (i + 1) * fsize]
        diffs = [abs(a - b) for a, b in zip(rgb, ref)]
        assert max(diffs) <= entry["tol"], (i, max(diffs))
        assert sum(diffs) / len(diffs) <= 1.0, i


def test_corpus_is_complete():
    """Every payload in the directory is covered by a manifest entry and
    vice versa — a new fixture can't silently go untested."""
    files = {
        f
        for f in os.listdir(CORPUS)
        if not f.endswith(".src") and f not in ("manifest.json", "manifest2.json")
    }
    assert files == {e["file"] for e in MANIFEST}
    for e in MANIFEST:
        assert os.path.exists(os.path.join(CORPUS, e["src"]))
