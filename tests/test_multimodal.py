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
    # JPEG stays behind the codec boundary
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.decode_image_stub(b"\xff\xd8\xff\xe0....")
    # a PNG *signature* with garbage chunks is malformed, not a codec
    # gap: it digests deterministically instead of raising
    feat = multimodal.decode_image_stub(b"\x89PNG\r\n\x1a\n....")
    assert len(feat) == multimodal.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in feat)


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


# ---------------------------------------------------------------------------
# Real decode path: uncompressed 24-bit BMP / binary P6 PPM parsed
# pixel-for-pixel (no codec libs involved).


def make_bmp(pixels):
    """Encode rows of (r, g, b) tuples as a bottom-up 24-bit BI_RGB BMP."""
    import struct

    h, w = len(pixels), len(pixels[0])
    stride = (w * 3 + 3) & ~3
    data = bytearray()
    for row in reversed(pixels):  # positive height => bottom-up storage
        rb = bytearray()
        for r, g, b in row:
            rb += bytes((b, g, r))  # BGR on disk
        rb += b"\x00" * (stride - len(rb))
        data += rb
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    header += struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(data)


def make_ppm(pixels):
    h, w = len(pixels), len(pixels[0])
    body = bytes(v for row in pixels for px in row for v in px)
    return f"P6\n{w} {h}\n255\n".encode() + body


PIXELS_4X4 = [
    [(x * 16, y * 16, x + y) for x in range(4)] for y in range(4)
]


def expected_features(pixels):
    flat = [px for row in pixels for px in row]
    n = len(flat)
    lums = [(r + g + b) / 3.0 for r, g, b in flat]
    return [
        float(len(pixels[0])),
        float(len(pixels)),
        round(sum(p[0] for p in flat) / n, 6),
        round(sum(p[1] for p in flat) / n, 6),
        round(sum(p[2] for p in flat) / n, 6),
        round(min(lums), 6),
        round(max(lums), 6),
        round(sum(lums) / n, 6),
    ]


def test_bmp_decodes_to_exact_pixel_features():
    got = multimodal.decode_image_stub(make_bmp(PIXELS_4X4))
    assert got == expected_features(PIXELS_4X4)


def test_ppm_decodes_to_exact_pixel_features():
    assert multimodal.decode_image_stub(make_ppm(PIXELS_4X4)) == expected_features(
        PIXELS_4X4
    )


def test_bmp_and_ppm_agree_pixelwise():
    # same pixels, two encodings, one feature vector
    assert multimodal.decode_image_stub(
        make_bmp(PIXELS_4X4)
    ) == multimodal.decode_image_stub(make_ppm(PIXELS_4X4))


def test_bmp_decode_through_spark_arrow_path(spark):
    rows = [(10, "image", make_bmp(PIXELS_4X4), "image/bmp", 4, 4, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_features(media).collect()
    assert len(out) == 1
    assert out[0]["feature"] == expected_features(PIXELS_4X4)


def test_malformed_bmp_falls_back_to_digest():
    # valid magic, garbage header: strict parser must reject, not misdecode
    payload = b"BM" + b"\x01" * 60
    feat = multimodal.decode_image_stub(payload)
    assert len(feat) == multimodal.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in feat)  # digest fake, not pixel stats


def test_ppm_strictness_matches_bmp_contract():
    """The P6 parser must be as strict as BMP (the ~2^-80 false-positive
    bound): no whitespace after the magic, junk after the pixel block, or
    a non-whitespace separator byte all fall back to the digest vector;
    one trailing newline is tolerated (common writer behavior)."""
    good = make_ppm(PIXELS_4X4)
    digest = multimodal.decode_image_stub(b"\x00" * 64)

    def is_digest(feat):
        return feat != expected_features(PIXELS_4X4)

    # magic not followed by whitespace: "P64 4\n..." must not read w=64
    no_ws = b"P6" + good[3:]
    assert is_digest(multimodal.decode_image_stub(no_ws))
    # trailing junk after the pixel block
    assert is_digest(multimodal.decode_image_stub(good + b"JUNK"))
    assert is_digest(multimodal.decode_image_stub(good + b"\n\n"))
    # single trailing newline is fine
    assert multimodal.decode_image_stub(good + b"\n") == expected_features(
        PIXELS_4X4
    )
    # non-whitespace separator after maxval
    bad_sep = good.replace(b"255\n", b"255X", 1)
    assert is_digest(multimodal.decode_image_stub(bad_sep))
    assert len(digest) == multimodal.FEATURE_DIM


def test_real_resize_nearest_neighbor(spark):
    rows = [(20, "image", make_bmp(PIXELS_4X4), "image/bmp", 4, 4, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(media, target_w=2, target_h=2).collect()
    resized = bytes(out[0]["resized"])
    # nearest-neighbor 4x4 -> 2x2 samples source pixels (0,0)(2,0)(0,2)(2,2)
    want = make_ppm(
        [
            [PIXELS_4X4[0][0], PIXELS_4X4[0][2]],
            [PIXELS_4X4[2][0], PIXELS_4X4[2][2]],
        ]
    )
    assert resized == want


# ---------------------------------------------------------------------------
# Real PNG decode: stdlib zlib inflate + per-row unfilter, no codec libs.


def make_png(
    pixels, color_type=2, row_filters=None, depth=8, interlace=0, palette=None
):
    """Encode a non-interlaced PNG exercising the chosen per-row filter
    types (0..4). ``pixels`` rows hold (r,g,b[,a]) tuples for color types
    2/6, scalar samples for grayscale (0), (g, a) pairs for gray+alpha
    (4), and palette INDICES for type 3 (with ``palette`` = list of RGB
    triples). Sub-byte depths (1/2/4) pack samples MSB-first for types
    0/3."""
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]

    def samples(p):
        if color_type in (2, 6):
            p = tuple(p)
            return (
                list(p[:ch]) if len(p) >= ch else list(p) + [255] * (ch - len(p))
            )
        if color_type == 4:
            return list(p)
        return [p]  # 0 / 3: scalar sample

    def pack_row(row):
        flat = [s for p in row for s in samples(p)]
        if depth == 16:  # 8-bit source scaled up; decoder raises pre-inflate
            return b"".join(struct.pack(">H", s * 257) for s in flat)
        if depth == 8:
            return bytes(flat)
        packed, acc, nbits = bytearray(), 0, 0
        for s in flat:
            acc = (acc << depth) | s
            nbits += depth
            if nbits == 8:
                packed.append(acc)
                acc, nbits = 0, 0
        if nbits:
            packed.append(acc << (8 - nbits))
        return bytes(packed)

    rows = [pack_row(row) for row in pixels]
    stride = (w * ch * depth + 7) // 8
    bpp = max(1, ch * depth // 8)
    filters = row_filters if row_filters is not None else [0] * h

    def paeth(a, b, c):
        q = a + b - c
        pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(stride)
    for row, f in zip(rows, filters):
        raw.append(f)
        n = len(row)
        left = lambda i: row[i - bpp] if i >= bpp else 0
        upleft = lambda i: prev[i - bpp] if i >= bpp else 0
        if f == 0:
            filt = row
        elif f == 1:
            filt = bytes((row[i] - left(i)) & 0xFF for i in range(n))
        elif f == 2:
            filt = bytes((row[i] - prev[i]) & 0xFF for i in range(n))
        elif f == 3:
            filt = bytes(
                (row[i] - ((left(i) + prev[i]) >> 1)) & 0xFF for i in range(n)
            )
        else:
            filt = bytes(
                (row[i] - paeth(left(i), prev[i], upleft(i))) & 0xFF
                for i in range(n)
            )
        raw += filt
        prev = row

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    plte = (
        chunk(b"PLTE", b"".join(bytes(c) for c in palette))
        if palette is not None
        else b""
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + plte
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decodes_to_exact_pixel_features_all_filters():
    for filters in ([0, 1, 2, 3], [4, 4, 2, 1], [3, 4, 0, 2]):
        got = multimodal.decode_image_stub(
            make_png(PIXELS_4X4, row_filters=filters)
        )
        assert got == expected_features(PIXELS_4X4), filters


def test_png_matches_bmp_and_ppm_pixelwise():
    assert (
        multimodal.decode_image_stub(make_png(PIXELS_4X4, row_filters=[1, 4, 3, 2]))
        == multimodal.decode_image_stub(make_bmp(PIXELS_4X4))
        == multimodal.decode_image_stub(make_ppm(PIXELS_4X4))
    )


def test_png_rgba_alpha_is_dropped():
    rgba = [[(r, g, b, (r + g) % 256) for r, g, b in row] for row in PIXELS_4X4]
    got = multimodal.decode_image_stub(
        make_png(rgba, color_type=6, row_filters=[0, 1, 2, 4])
    )
    assert got == expected_features(PIXELS_4X4)


def test_png_strictness_falls_back_to_digest():
    good = make_png(PIXELS_4X4)

    def is_digest(payload):
        feat = multimodal.decode_image_stub(payload)
        return feat != expected_features(PIXELS_4X4) and len(feat) == (
            multimodal.FEATURE_DIM
        )

    # corrupt one IDAT byte: the chunk CRC must catch it
    idat_at = good.find(b"IDAT") + 6
    corrupted = good[:idat_at] + bytes([good[idat_at] ^ 0xFF]) + good[idat_at + 1 :]
    assert is_digest(corrupted)
    # trailing junk after IEND
    assert is_digest(good + b"x")
    # truncated payload
    assert is_digest(good[:-5])


def test_png_unsupported_variants_raise():
    with pytest.raises(NotImplementedError, match="PNG"):
        multimodal.decode_image_stub(make_png(PIXELS_4X4, interlace=1))
    with pytest.raises(NotImplementedError, match="PNG"):
        multimodal.decode_image_stub(make_png(PIXELS_4X4, depth=16))


def test_png_grayscale_decodes_like_expanded_rgb():
    """Color type 0: sample g must land as RGB (g,g,g) — verified against
    the RGB decode of the expanded image, across all filter types."""
    gray = [[r for r, _, _ in row] for row in PIXELS_4X4]
    rgb = [[(v, v, v) for v in row] for row in gray]
    got = multimodal.decode_image_stub(
        make_png(gray, color_type=0, row_filters=[0, 1, 2, 4])
    )
    assert got == expected_features(rgb)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_grayscale_scales_by_bit_replication(depth):
    """1/2/4-bit grayscale: packed samples unpack MSB-first and scale by
    255/(2^d-1) — e.g. 2-bit 0b11 -> 255, 0b01 -> 85."""
    hi = (1 << depth) - 1
    gray = [[0, hi, hi, 0, 1 % (hi + 1)] for _ in range(3)]
    scale = 255 // hi
    rgb = [[(v * scale,) * 3 for v in row] for row in gray]
    got = multimodal.decode_image_stub(
        make_png(gray, color_type=0, depth=depth, row_filters=[0, 2, 1])
    )
    assert got == expected_features(rgb)


def test_png_gray_alpha_drops_alpha():
    gray = [[r for r, _, _ in row] for row in PIXELS_4X4]
    ga = [[(v, (v * 7) % 256) for v in row] for row in gray]
    rgb = [[(v, v, v) for v in row] for row in gray]
    got = multimodal.decode_image_stub(
        make_png(ga, color_type=4, row_filters=[0, 1, 3, 4])
    )
    assert got == expected_features(rgb)


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_png_palette_decodes_through_plte(depth):
    pal = [(250, 10, 30), (0, 128, 255)] + (
        [(5, 250, 125)] if depth > 1 else []
    )
    n = len(pal)
    idx = [[(x + y) % n for x in range(6)] for y in range(4)]
    rgb = [[pal[i] for i in row] for row in idx]
    got = multimodal.decode_image_stub(
        make_png(idx, color_type=3, depth=depth, palette=pal,
                 row_filters=[0, 1, 2, 4])
    )
    assert got == expected_features(rgb)


def test_png_palette_strictness():
    pal = [(250, 10, 30), (0, 128, 255)]
    idx = [[0, 1, 1, 0]]

    def is_digest(payload):
        feat = multimodal.decode_image_stub(payload)
        return len(feat) == multimodal.FEATURE_DIM and feat[0] != 4.0

    # palette type without a PLTE chunk is structurally invalid -> digest
    assert is_digest(make_png(idx, color_type=3, palette=None))
    # an index past the palette end is corruption -> digest
    assert is_digest(make_png([[0, 1, 2, 0]], color_type=3, palette=pal))
    # PLTE on a grayscale type is forbidden by the spec -> digest
    gray = [[10, 20, 30, 40]]
    assert is_digest(make_png(gray, color_type=0, palette=pal))


def test_png_decode_through_spark_arrow_path(spark):
    rows = [
        (40, "image", make_png(PIXELS_4X4, row_filters=[0, 1, 2, 4]),
         "image/png", 4, 4, None)
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_features(media).collect()
    assert len(out) == 1
    assert out[0]["feature"] == expected_features(PIXELS_4X4)


# ---------------------------------------------------------------------------
# Real audio decode: 16-bit PCM RIFF/WAVE parsed sample-for-sample.


def make_wav(samples, n_ch=1, rate=8000):
    """Encode interleaved int16 samples as a minimal PCM WAV."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_decodes_to_exact_audio_features():
    # square wave: +16384 / -16384 alternating, 8 frames mono @ 8 kHz
    samples = [16384, -16384] * 4
    got = multimodal.decode_image_stub(make_wav(samples))
    assert got[0] == 1.0  # channels
    assert got[1] == 8000.0  # rate
    assert got[2] == 8.0  # frames
    assert got[3] == 1.0  # duration_ms
    assert got[4] == 0.5  # rms of a half-scale square wave
    assert got[5] == 0.5  # peak
    assert got[6] == 0.0  # symmetric -> zero mean
    assert got[7] == 1.0  # sign flips every sample


def test_wav_stereo_decode_through_spark_arrow_path(spark):
    # stereo: L channel constant positive, R channel constant negative
    samples = [1000, -2000] * 6  # 6 frames, 2 channels
    rows = [(30, "audio", make_wav(samples, n_ch=2, rate=4000), "audio/wav",
             None, None, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_features(media).collect()
    feat = out[0]["feature"]
    assert feat[0] == 2.0 and feat[1] == 4000.0 and feat[2] == 6.0
    assert feat[3] == 1.5  # 6 frames @ 4 kHz = 1.5 ms
    assert feat[7] == 0.0  # first channel never crosses zero


def test_wav_non_pcm_raises():
    import struct

    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # fmt 85 = MP3
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(NotImplementedError, match="PCM"):
        multimodal.decode_image_stub(wav)


def test_malformed_wav_falls_back_to_digest():
    payload = b"RIFF" + b"\x01" * 60  # bad riff size / structure
    feat = multimodal.decode_image_stub(payload)
    assert len(feat) == multimodal.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in feat)


# ---------------------------------------------------------------------------
# Fuzz: a malformed payload must NEVER crash the decoder (an executor
# exception at 100 TB kills the whole stage) — every input either decodes,
# falls back to the digest vector, or raises the explicit codec
# NotImplementedError. Nothing else may escape.


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_magic_prefixes = st.sampled_from(
    [b"", b"BM", b"P6", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE", b"\x89PNG",
     b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0"]
)


@given(_magic_prefixes, st.binary(min_size=0, max_size=200))
@settings(max_examples=300, deadline=None)
def test_decode_never_crashes_on_malformed_payloads(prefix, junk):
    payload = prefix + junk
    try:
        out = multimodal.decode_image_stub(payload)
    except NotImplementedError:
        return  # the explicit codec boundary — allowed
    assert isinstance(out, list) and len(out) == multimodal.FEATURE_DIM


@given(
    st.integers(1, 6),
    st.integers(1, 6),
    st.sampled_from([2, 6]),
    st.data(),
)
@settings(max_examples=200, deadline=None)
def test_png_roundtrip_random_images_and_filters(w, h, color_type, data):
    """Any image encoded with any mix of per-row filter types must decode
    to exactly its source pixels (alpha dropped for RGBA)."""
    pixels = [
        [
            tuple(
                data.draw(st.integers(0, 255))
                for _ in range(3 if color_type == 2 else 4)
            )
            for _ in range(w)
        ]
        for _ in range(h)
    ]
    filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
    got = multimodal.decode_image_stub(
        make_png(pixels, color_type=color_type, row_filters=filters)
    )
    rgb = [[p[:3] for p in row] for row in pixels]
    assert got == expected_features(rgb), (w, h, color_type, filters)
