"""Multimodal plumbing: schema/batch contract of the mapInPandas feature
extractor, the explicit stub boundary, and the native frame-sampling plan."""

from __future__ import annotations

import pytest

from wsspark.llmops import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"fake-image-bytes", "application/octet-stream", 64, 64, None),
        (2, "audio", b"fake-audio", "application/octet-stream", None, None, 2500),
        (3, "video", b"fake-video", "application/octet-stream", 320, 240, 3500),
        (4, "image", None, None, None, None, None),  # missing payload
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_extract_features_contract(spark, media):
    out = multimodal.extract_features(media).collect()
    by_id = {r["media_id"]: r for r in out}
    assert set(by_id) == {1, 2, 3, 4}
    assert by_id[1]["n_bytes"] == len(b"fake-image-bytes")
    assert len(by_id[1]["feature"]) == multimodal.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in by_id[1]["feature"])
    assert by_id[4]["n_bytes"] == 0 and by_id[4]["feature"] is None


def test_extract_features_deterministic(spark, media):
    a = sorted(map(tuple, multimodal.extract_features(media).collect()))
    b = sorted(map(tuple, multimodal.extract_features(media).collect()))
    assert a == b


def test_stub_boundary_rejects_real_codecs():
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.decode_image_stub(b"\x89PNG\r\n\x1a\n....")


def test_sample_frames_plan(spark, media):
    frames = multimodal.sample_frames(media, every_ms=1000).collect()
    # only the video row (id 3, 3500 ms) -> frames at 0,1000,2000,3000
    assert [r["media_id"] for r in frames] == [3, 3, 3, 3]
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_resize_plumbing(spark, media):
    out = {r["media_id"]: r for r in multimodal.resize_images(media).collect()}
    assert set(out) == {1, 4}  # image rows only
    assert out[1]["target_w"] == 224
    assert bytes(out[1]["resized"]).startswith(b"RESIZED[224x224]")
    assert bytes(out[1]["resized"]).endswith(b"fake-image-bytes")
    assert out[4]["resized"] is None  # null payload flows through
