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
    # a JPEG SOI with garbage segments is malformed, not a codec gap:
    # it digests deterministically instead of raising (the structurally
    # VALID unsupported profiles — progressive etc. — raise; see
    # test_jpeg_unsupported_profiles_raise)
    feat = multimodal.decode_image_stub(b"\xff\xd8\xff\xe0....")
    assert len(feat) == multimodal.FEATURE_DIM
    # a PNG *signature* with garbage chunks likewise digests
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
    # luminance via exact INTEGER channel sums divided once at the end —
    # the decoder's formulation (multimodal.py: sum(lums)/(3.0*n)). The
    # old per-pixel (r+g+b)/3.0 accumulation drifts a few ulps and can
    # land on the other side of a round-half boundary (hypothesis found
    # 31/128 = 0.2421875 rounding to .242187 here vs .242188 there).
    flat = [px for row in pixels for px in row]
    n = len(flat)
    lums = [r + g + b for r, g, b in flat]
    return [
        float(len(pixels[0])),
        float(len(pixels)),
        round(sum(p[0] for p in flat) / n, 6),
        round(sum(p[1] for p in flat) / n, 6),
        round(sum(p[2] for p in flat) / n, 6),
        round(min(lums) / 3.0, 6),
        round(max(lums) / 3.0, 6),
        round(sum(lums) / (3.0 * n), 6),
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

    bpp = max(1, ch * depth // 8)
    filters = row_filters if row_filters is not None else [0]

    def paeth(a, b, c):
        q = a + b - c
        pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    if interlace:
        groups = []
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            xs = list(range(x0, w, dx))
            g = [[pixels[y][x] for x in xs] for y in range(y0, h, dy)]
            if g and xs:
                groups.append(g)
    else:
        groups = [pixels]

    raw = bytearray()
    fi = 0
    for g in groups:
        prev = bytes(len(pack_row(g[0])))
        for prow in g:
            f = filters[fi % len(filters)]
            fi += 1
            raw.append(f)
            row = pack_row(prow)
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


def test_png_16bit_reduces_to_high_byte():
    """16-bit samples (encoded v*257, so high byte == v) decode exactly:
    the spec-sanctioned 16->8 reduction keeps the high byte."""
    got = multimodal.decode_image_stub(
        make_png(PIXELS_4X4, depth=16, row_filters=[0, 1, 2, 4])
    )
    assert got == expected_features(PIXELS_4X4)
    # 16-bit grayscale too (bpp = 2 exercises the filter neighbor offset)
    gray = [[r for r, _, _ in row] for row in PIXELS_4X4]
    rgb = [[(v, v, v) for v in row] for row in gray]
    got = multimodal.decode_image_stub(
        make_png(gray, color_type=0, depth=16, row_filters=[4, 3, 2, 1])
    )
    assert got == expected_features(rgb)


@pytest.mark.parametrize("dims", [(4, 4), (8, 8), (9, 10), (16, 11), (3, 2), (1, 1)])
def test_png_adam7_interlace_decodes(dims):
    """Adam7: every pass is its own filtered sub-image; small dims leave
    some passes empty (zero bytes). Must equal the straight decode."""
    w, h = dims
    pixels = [
        [((x * 31) % 256, (y * 53) % 256, (x * 7 + y * 11) % 256) for x in range(w)]
        for y in range(h)
    ]
    plain = multimodal.decode_image_stub(make_png(pixels))
    inter = multimodal.decode_image_stub(
        make_png(pixels, interlace=1, row_filters=[0, 1, 2, 3, 4])
    )
    assert plain == inter == expected_features(pixels), dims


def test_png_adam7_with_palette_and_16bit():
    pal = [(250, 10, 30), (0, 128, 255), (5, 250, 125)]
    idx = [[(x + y) % 3 for x in range(9)] for y in range(6)]
    rgb = [[pal[i] for i in row] for row in idx]
    got = multimodal.decode_image_stub(
        make_png(idx, color_type=3, palette=pal, interlace=1,
                 row_filters=[0, 1])
    )
    assert got == expected_features(rgb)
    got16 = multimodal.decode_image_stub(
        make_png(PIXELS_4X4, depth=16, interlace=1, row_filters=[2, 4])
    )
    assert got16 == expected_features(PIXELS_4X4)


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


# ---------------------------------------------------------------------------
# JPEG: independent numpy encoder (forward DCT-II, canonical Huffman,
# transcribed-literal zigzag) vs the decoder's pure-Python from-spec
# implementation. Shared code between the two: none — a defect in either
# side breaks the round-trip.
# ---------------------------------------------------------------------------

# the standard zigzag order, transcribed (NOT generated) so it independently
# cross-checks the decoder's generated table
JPEG_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

JPEG_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def make_jpeg(pixels, sampling=(1, 1), gray=False, quant=None, dri=0):
    """Baseline JFIF encoder: numpy forward DCT, all-ones default quant
    (near-lossless), flat canonical Huffman tables (DC cats at 4 bits, the
    162 AC symbols at 8 bits), optional 2x2-mean chroma subsampling and
    restart markers."""
    import struct

    import numpy as np

    h, w = len(pixels), len(pixels[0])
    rgb = np.array(
        [[list(p) for p in row] for row in pixels], dtype=np.float64
    )
    A = np.array(
        [
            [
                (1 / np.sqrt(2) if u == 0 else 1.0)
                / 2.0
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for u in range(8)
            ]
            for x in range(8)
        ]
    )
    qzz = list(quant) if quant is not None else [1] * 64
    qnat = np.empty(64)
    for k in range(64):
        qnat[JPEG_ZZ[k]] = qzz[k]
    qnat = qnat.reshape(8, 8)

    if gray:
        comps = [(1, 1, 1)]
        planes = {
            1: 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        }
    else:
        hs, vs = sampling
        comps = [(1, hs, vs), (2, 1, 1), (3, 1, 1)]
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        planes = {1: y, 2: cb, 3: cr}

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    def prep(plane, chs, cvs):
        # subsample by block mean, then edge-pad to the MCU grid
        if (chs, cvs) != (hmax, vmax):
            fy, fx = vmax // cvs, hmax // chs
            ph = -(-plane.shape[0] // fy) * fy
            pw = -(-plane.shape[1] // fx) * fx
            p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge")
            plane = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcus_y * cvs * 8, mcus_x * chs * 8
        return np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )

    padded = {cid: prep(planes[cid], chs, cvs) for cid, chs, cvs in comps}

    # --- bit writer with stuffing
    out_bits = []

    def put(v, n):
        for i in range(n - 1, -1, -1):
            out_bits.append((v >> i) & 1)

    def huff_dc(cat):
        put(cat, 4)  # DC table: 12 codes, all length 4, code == category

    def huff_ac(sym):
        put(JPEG_AC_SYMBOLS.index(sym), 8)  # AC: 162 codes, all length 8

    def flush_to_bytes():
        bits = out_bits[:]
        while len(bits) % 8:
            bits.append(1)  # pad with 1s per spec
        raw = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for bt in bits[i : i + 8]:
                byte = (byte << 1) | bt
            raw.append(byte)
            if byte == 0xFF:
                raw.append(0x00)  # stuffing
        out_bits.clear()
        return bytes(raw)

    def cat_of(v):
        return 0 if v == 0 else int(abs(v)).bit_length()

    def put_val(v, t):
        if t:
            put(v if v >= 0 else v + (1 << t) - 1, t)

    def encode_block(plane, bx, by, pred):
        g = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
        F = np.round(A.T @ g @ A / qnat).astype(int)
        zz = [int(F.flat[JPEG_ZZ[k]]) for k in range(64)]
        diff = zz[0] - pred
        t = cat_of(diff)
        huff_dc(t)
        put_val(diff, t)
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                huff_ac(0xF0)
                run -= 16
            s = cat_of(zz[k])
            huff_ac((run << 4) | s)
            put_val(zz[k], s)
            run = 0
        if last_nz < 63:
            huff_ac(0x00)  # EOB
        return zz[0]

    entropy = bytearray()
    preds = {cid: 0 for cid, *_ in comps}
    rst_m = 0
    since = 0
    n_units = mcus_x * mcus_y
    for u in range(n_units):
        my, mx = divmod(u, mcus_x)
        for cid, chs, cvs in comps:
            for byi in range(cvs):
                for bxi in range(chs):
                    preds[cid] = encode_block(
                        padded[cid], mx * chs + bxi, my * cvs + byi, preds[cid]
                    )
        since += 1
        if dri and u != n_units - 1 and since == dri:
            entropy += flush_to_bytes()
            entropy += bytes((0xFF, 0xD0 + rst_m))
            rst_m = (rst_m + 1) & 7
            since = 0
            preds = {cid: 0 for cid, *_ in comps}
    entropy += flush_to_bytes()

    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    dc_counts = [0] * 16
    dc_counts[3] = 12  # 12 categories at length 4
    ac_counts = [0] * 16
    ac_counts[7] = len(JPEG_AC_SYMBOLS)  # all at length 8
    dht = seg(
        0xC4,
        bytes([0x00] + dc_counts) + bytes(range(12))
        + bytes([0x10] + ac_counts) + bytes(JPEG_AC_SYMBOLS),
    )
    sof_body = struct.pack(">BHHB", 8, h, w, len(comps)) + b"".join(
        bytes((cid, (chs << 4) | cvs, 0)) for cid, chs, cvs in comps
    )
    sos_body = bytes([len(comps)]) + b"".join(
        bytes((cid, 0x00)) for cid, *_ in comps
    ) + bytes((0, 63, 0))
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, bytes([0x00]) + bytes(qzz))
        + seg(0xC0, sof_body)
        + dht
        + (seg(0xDD, struct.pack(">H", dri)) if dri else b"")
        + seg(0xDA, sos_body)
        + entropy
        + b"\xff\xd9"
    )


def _jpeg_pixels(payload):
    parse = multimodal._make_jpeg_parser()
    img = parse(payload)
    assert img is not None, "decoder rejected a structurally-valid JPEG"
    return img


def _max_err(rgb, pixels):
    flat = [v for row in pixels for p in row for v in p]
    assert len(rgb) == len(flat)
    return max(abs(a - b) for a, b in zip(rgb, flat))


GRAD_16 = [
    [((x * 16) % 256, (y * 16) % 256, (x * 7 + y * 13) % 256) for x in range(16)]
    for y in range(16)
]


def test_jpeg_roundtrip_444_near_lossless():
    """All-ones quant + 4:4:4: the only loss is DCT/color-convert float
    rounding — every decoded sample within a few counts of the source,
    through two fully independent DCT implementations."""
    w, h, rgb = _jpeg_pixels(make_jpeg(GRAD_16))
    assert (w, h) == (16, 16)
    assert _max_err(rgb, GRAD_16) <= 4


def test_jpeg_grayscale_single_component():
    gray = [[(v, v, v) for v, _, _ in row] for row in GRAD_16]
    w, h, rgb = _jpeg_pixels(make_jpeg(gray, gray=True))
    assert (w, h) == (16, 16)
    assert _max_err(rgb, gray) <= 3


def test_jpeg_420_solid_color_exact_chroma():
    """2x2 subsampled chroma on a solid image: subsample-then-replicate is
    lossless, so the round-trip error stays at float-rounding level."""
    solid = [[(200, 60, 130)] * 16 for _ in range(16)]
    w, h, rgb = _jpeg_pixels(make_jpeg(solid, sampling=(2, 2)))
    assert (w, h) == (16, 16)
    assert _max_err(rgb, solid) <= 3


SMOOTH_16 = [
    [(x * 8 + 40, y * 8 + 30, x * 4 + y * 4 + 20) for x in range(16)]
    for y in range(16)
]  # gentle slopes, no mod-256 wraps: chroma subsampling loss stays local


def test_jpeg_420_gradient_bounded():
    """Subsampled chroma on a smooth gradient: luma stays near-lossless;
    chroma replication cost is bounded by the local chroma slope. (A
    wrapping gradient like GRAD_16 would legitimately lose ~128 at the
    discontinuity — that is chroma subsampling working as specified, not
    decoder error.)"""
    w, h, rgb = _jpeg_pixels(make_jpeg(SMOOTH_16, sampling=(2, 2)))
    assert (w, h) == (16, 16)
    assert _max_err(rgb, SMOOTH_16) <= 16


def test_jpeg_non_multiple_of_mcu_dims():
    """11x5 image: right/bottom MCU padding must decode and crop away."""
    pix = [row[:11] for row in GRAD_16[:5]]
    w, h, rgb = _jpeg_pixels(make_jpeg(pix))
    assert (w, h) == (11, 5)
    assert _max_err(rgb, pix) <= 4


def test_jpeg_restart_markers():
    """DRI=1: a restart marker between every MCU — bit alignment, RSTm
    cycling, and DC-predictor resets all exercised 15 times."""
    w, h, rgb = _jpeg_pixels(make_jpeg(SMOOTH_16, sampling=(2, 2), dri=1))
    assert (w, h) == (16, 16)
    assert _max_err(rgb, SMOOTH_16) <= 16
    # and on the full-resolution path with a coarser interval
    w2, h2, rgb2 = _jpeg_pixels(make_jpeg(GRAD_16, dri=2))
    assert _max_err(rgb2, GRAD_16) <= 4


def test_jpeg_real_quantization_still_decodes():
    """A non-trivial quant table (values 1..24) loses precision by design;
    the decode must stay plausible (bounded error), proving dequantize
    multiplies the right table in the right (zigzag) order."""
    quant = [1 + (k % 24) for k in range(64)]
    w, h, rgb = _jpeg_pixels(make_jpeg(GRAD_16, quant=quant))
    assert (w, h) == (16, 16)
    assert _max_err(rgb, GRAD_16) <= 80  # lossy, but anchored


def test_jpeg_feature_extraction_matches_decoded_pixels():
    payload = make_jpeg(GRAD_16)
    w, h, rgb = _jpeg_pixels(payload)
    pixels = [
        [tuple(rgb[3 * (y * w + x) : 3 * (y * w + x) + 3]) for x in range(w)]
        for y in range(h)
    ]
    assert multimodal.decode_image_stub(payload) == expected_features(pixels)


def test_jpeg_strictness_falls_back_to_digest():
    good = make_jpeg(GRAD_16)

    def is_digest(payload):
        feat = multimodal.decode_image_stub(payload)
        return len(feat) == multimodal.FEATURE_DIM and feat[0] != 16.0

    assert is_digest(good + b"x")  # trailing junk after EOI
    assert is_digest(good[:-2])  # missing EOI
    assert is_digest(good[:-40])  # truncated entropy data
    # corrupt a Huffman-coded byte mid-stream: decode must fail closed
    sos_at = good.find(b"\xff\xda")
    k = sos_at + 40
    corrupted = good[:k] + bytes([good[k] ^ 0x5A]) + good[k + 1 :]
    feat = multimodal.decode_image_stub(corrupted)
    assert len(feat) == multimodal.FEATURE_DIM


def test_jpeg_unsupported_profiles_raise():
    good = make_jpeg(GRAD_16)
    # lossless (SOF3): the marker class check fires before entropy decode
    lossless = good.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(NotImplementedError, match="lossless"):
        multimodal.decode_image_stub(lossless)
    # 12-bit precision: SOF precision byte is right after the length
    sof_at = good.find(b"\xff\xc0")
    twelve = good[: sof_at + 4] + b"\x0c" + good[sof_at + 5 :]
    with pytest.raises(NotImplementedError, match="12/16-bit"):
        multimodal.decode_image_stub(twelve)
    # 16-bit quant table (pq=1)
    dqt_at = good.find(b"\xff\xdb")
    pq1 = good[: dqt_at + 4] + b"\x10" + good[dqt_at + 5 :]
    with pytest.raises(NotImplementedError, match="quantization"):
        multimodal.decode_image_stub(pq1)
    # a SOF0 stream rewritten to claim SOF2 has baseline scan headers that
    # are INVALID under progressive validation -> digest fallback, no raise
    prog_invalid = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    feat = multimodal.decode_image_stub(prog_invalid)
    assert len(feat) == multimodal.FEATURE_DIM


def test_jpeg_zigzag_tables_agree():
    """The decoder generates its zigzag programmatically; the encoder
    transcribes the standard table. They must be inverses of nothing —
    literally the same permutation."""
    import math  # noqa: F401  (parity with decoder's env)

    parse_mod = multimodal._make_jpeg_parser.__code__
    # reconstruct the decoder's generated order the same way it does
    order = []
    for s in range(15):
        diag = [(s - j, j) for j in range(s + 1) if s - j < 8 and j < 8]
        if s % 2:
            diag = diag[::-1]
        order += [r * 8 + c for r, c in diag]
    assert order == JPEG_ZZ
    assert parse_mod is not None


def test_jpeg_decode_through_spark_arrow_path(spark):
    payload = make_jpeg(GRAD_16)
    rows = [(50, "image", payload, "image/jpeg", 16, 16, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_features(media).collect()
    assert len(out) == 1
    w, h, rgb = _jpeg_pixels(payload)
    pixels = [
        [tuple(rgb[3 * (y * w + x) : 3 * (y * w + x) + 3]) for x in range(w)]
        for y in range(h)
    ]
    assert out[0]["feature"] == expected_features(pixels)


def test_jpeg_resize_roundtrip(spark):
    """JPEG payloads now flow through the real resize path (decode ->
    nearest-neighbor -> P6 re-encode) instead of raising."""
    payload = make_jpeg(GRAD_16)
    rows = [(60, "image", payload, "image/jpeg", 16, 16, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(media, target_w=4, target_h=4).collect()
    resized = bytes(out[0]["resized"])
    assert resized.startswith(b"P6\n4 4\n255\n")
    assert len(resized) == len(b"P6\n4 4\n255\n") + 4 * 4 * 3


@given(
    st.integers(1, 20),
    st.integers(1, 20),
    st.sampled_from([(1, 1), (2, 1), (2, 2)]),
    st.booleans(),
    st.integers(0, 3),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_roundtrip_random_images(w, h, sampling, gray, dri, data):
    """Random dims x sampling x grayscale x restart intervals: with
    all-ones quant the decode must land within float-rounding + (for
    subsampled chroma) local-slope distance of the source. Solid-color
    rows make the chroma bound tight; random pixels get the loose luma
    bound only when chroma is full-resolution."""
    solid = data.draw(st.booleans())
    if solid:
        p = tuple(data.draw(st.integers(0, 255)) for _ in range(3))
        pixels = [[p] * w for _ in range(h)]
    else:
        pixels = [
            [
                tuple(data.draw(st.integers(0, 255)) for _ in range(3))
                for _ in range(w)
            ]
            for _ in range(h)
        ]
    if not solid and sampling != (1, 1) and not gray:
        return  # random chroma + subsampling loses by design; not a decoder test
    payload = make_jpeg(pixels, sampling=sampling, gray=gray, dri=dri)
    parse = multimodal._make_jpeg_parser()
    img = parse(payload)
    assert img is not None, (w, h, sampling, gray, dri)
    dw, dh, rgb = img
    assert (dw, dh) == (w, h)
    if gray:
        want = [
            [(round(0.299 * r + 0.587 * g + 0.114 * b),) * 3 for r, g, b in row]
            for row in pixels
        ]
        assert _max_err(rgb, want) <= 6, (w, h, sampling, dri)
    else:
        assert _max_err(rgb, pixels) <= 6, (w, h, sampling, dri)


# ---------------------------------------------------------------------------
# AVI / Motion-JPEG: the video modality made real — container walk + the
# JPEG decoder per sampled frame.
# ---------------------------------------------------------------------------


def make_avi(jpeg_frames, width, height, us_per_frame=100_000):
    """Minimal-but-valid RIFF AVI wrapping Motion-JPEG frames: hdrl with
    avih + one vids strl (strh/strf biCompression='MJPG'), then movi with
    one 00dc chunk per frame. Independent of the product parser."""
    import struct

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<10I4I",
        us_per_frame, 0, 0, 0, len(jpeg_frames), 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<I", 0)
        + struct.pack("<HHI", 0, 0, 0)
        + struct.pack("<IIII", 1, 1_000_000 // us_per_frame, 0, len(jpeg_frames))
        + struct.pack("<IiI", 0, -1, 0) + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", 0, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


SOLIDS = [(220, 40, 40), (40, 220, 40), (40, 40, 220)]


def _solid_frames(n=3, w=16, h=16):
    return [
        make_jpeg([[SOLIDS[i % 3]] * w for _ in range(h)]) for i in range(n)
    ]


def test_avi_parser_structural():
    frames = _solid_frames(3)
    avi = make_avi(frames, 16, 16, us_per_frame=100_000)
    parse = multimodal._make_avi_parser()
    got = parse(avi)
    assert got is not None
    w, h, uspf, got_frames = got
    assert (w, h, uspf) == (16, 16, 100_000)
    assert got_frames == frames
    # strictness: truncated, resized, junk all digest-fallback (None)
    assert parse(avi[:-3]) is None
    assert parse(avi + b"x") is None
    assert parse(b"RIFF" + avi[4:]) is not None  # sanity: untouched passes


def test_avi_non_mjpg_codec_raises():
    frames = _solid_frames(1)
    avi = make_avi(frames, 16, 16)
    # flip BOTH biCompression and the handler fourcc to a real codec id
    h264 = avi.replace(b"MJPG", b"H264")
    with pytest.raises(NotImplementedError, match="Motion-JPEG"):
        multimodal._make_avi_parser()(h264)


def test_extract_frame_features_decodes_sampled_frames(spark):
    """10 fps stream (100ms/frame), 1-per-300ms sampling: frames 0, 3, 6
    decode — each a distinct solid color, so the features identify exactly
    which frame was picked."""
    frames = _solid_frames(9)
    avi = make_avi(frames, 16, 16, us_per_frame=100_000)
    rows = [(70, "video", avi, "video/avi", 16, 16, 900)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = sorted(
        multimodal.extract_frame_features(media, every_ms=300).collect(),
        key=lambda r: r["frame_ts_ms"],
    )
    assert [(r["frame_ts_ms"], r["frame_index"]) for r in out] == [
        (0, 0), (300, 3), (600, 6)
    ]
    for r in out:
        want = SOLIDS[r["frame_index"] % 3]
        got = r["feature"]
        assert (got[0], got[1]) == (16.0, 16.0)
        # solid-color JPEG round-trip: mean channel within rounding
        assert all(abs(got[2 + c] - want[c]) <= 3 for c in range(3)), r


def test_extract_frame_features_opaque_payload_digests(spark):
    rows = [(71, "video", b"not-an-avi", "video/mp4", None, None, 2500)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_frame_features(media, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in out] == [0, 1000, 2000]
    assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in out)
    # deterministic across runs
    again = multimodal.extract_frame_features(media, every_ms=1000).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# GIF: independent encoder (own LZW compressor) vs the from-spec decoder.
# ---------------------------------------------------------------------------


def lzw_compress(min_code, data):
    """GIF-variant LZW: emits clear first, variable code size LSB-first,
    dictionary capped at 4096, EOI last."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    size = min_code + 1
    bits = []

    def emit(code):
        for i in range(size):
            bits.append((code >> i) & 1)

    emit(clear)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << size) and size < 12:
                size += 1
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(eoi)
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i : i + 8]):
            byte |= bit << j
        out.append(byte)
    return bytes(out)


def make_gif(
    frames,
    palette,
    delays_ms=None,
    interlace=False,
    transparent=None,
    disposals=None,
    version=b"GIF89a",
    bg_index=0,
):
    """frames: list of 2-D index arrays (full canvas, same dims). palette:
    list of (r,g,b). Emits a GCE per frame when delays/transparency given."""
    import math

    h, w = len(frames[0]), len(frames[0][0])
    n_pal = max(2, 1 << max(1, math.ceil(math.log2(len(palette)))))
    pal_bits = max(1, (n_pal - 1).bit_length())
    n_pal = 1 << pal_bits
    pal = bytes(
        v
        for i in range(n_pal)
        for v in (palette[i] if i < len(palette) else (0, 0, 0))
    )
    out = bytearray()
    out += version
    out += bytes((w & 255, w >> 8, h & 255, h >> 8))
    out += bytes((0x80 | (pal_bits - 1), bg_index, 0))
    out += pal
    min_code = max(2, pal_bits)
    for k, frame in enumerate(frames):
        delay = (delays_ms or [0] * len(frames))[k] // 10
        disp = (disposals or [0] * len(frames))[k]
        if delays_ms is not None or transparent is not None or disp:
            flags = (disp & 7) << 2
            tr = 0
            if transparent is not None:
                flags |= 1
                tr = transparent
            out += bytes((0x21, 0xF9, 4, flags, delay & 255, delay >> 8, tr, 0))
        out += bytes((0x2C, 0, 0, 0, 0, w & 255, w >> 8, h & 255, h >> 8))
        out += bytes((0x40 if interlace else 0x00,))
        rows = list(range(h))
        if interlace:
            rows = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
        idx = bytes(frame[r][c] for r in rows for c in range(w))
        out += bytes((min_code,))
        comp = lzw_compress(min_code, idx)
        for i in range(0, len(comp), 255):
            blockb = comp[i : i + 255]
            out += bytes((len(blockb),)) + blockb
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


GIF_PAL = [(250, 10, 30), (0, 128, 255), (5, 250, 125), (200, 200, 0)]


def test_gif_static_decodes_exact():
    idx = [[(x + y) % 4 for x in range(7)] for y in range(5)]
    rgb = [[GIF_PAL[i] for i in row] for row in idx]
    got = multimodal.decode_image_stub(make_gif([idx], GIF_PAL))
    assert got == expected_features(rgb)


def test_gif_87a_and_interlace():
    idx = [[(x * y) % 4 for x in range(9)] for y in range(11)]
    rgb = [[GIF_PAL[i] for i in row] for row in idx]
    plain = multimodal.decode_image_stub(make_gif([idx], GIF_PAL, version=b"GIF87a"))
    inter = multimodal.decode_image_stub(make_gif([idx], GIF_PAL, interlace=True))
    assert plain == inter == expected_features(rgb)


def test_gif_lzw_crosses_code_size_boundaries():
    """A 64x64 noise image with a 4-color palette forces the LZW dictionary
    through multiple code-size bumps (and past early clear codes)."""
    idx = [[(x * 7 + y * 13 + (x * y) % 5) % 4 for x in range(64)] for y in range(64)]
    rgb = [[GIF_PAL[i] for i in row] for row in idx]
    got = multimodal.decode_image_stub(make_gif([idx], GIF_PAL))
    assert got == expected_features(rgb)


def test_gif_animation_frames_composite_and_sample(spark):
    """3 frames at 200ms each; sampling at 300ms picks frames 0 and 1
    (timeline 0-199, 200-399, 400-599); solid distinct colors identify
    the frame."""
    frames = [[[i] * 8 for _ in range(8)] for i in range(3)]
    gif = make_gif(frames, GIF_PAL, delays_ms=[200, 200, 200])
    rows = [(80, "video", gif, "image/gif", 8, 8, 600)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = sorted(
        multimodal.extract_frame_features(media, every_ms=300).collect(),
        key=lambda r: r["frame_ts_ms"],
    )
    assert [(r["frame_ts_ms"], r["frame_index"]) for r in out] == [(0, 0), (300, 1)]
    for r in out:
        want = GIF_PAL[r["frame_index"]]
        assert [r["feature"][2 + c] for c in range(3)] == [float(v) for v in want]


def test_gif_transparency_composites_over_previous():
    """Frame 2 is transparent except one pixel: the composited result is
    frame 1 with that single pixel changed."""
    f1 = [[0] * 4 for _ in range(4)]
    f2 = [[3 if (r, c) == (1, 2) else 1 for c in range(4)] for r in range(4)]
    gif = make_gif([f1, f2], GIF_PAL, delays_ms=[100, 100], transparent=1)
    parse = multimodal._make_gif_parser()
    w, h, frames = parse(gif)
    assert (w, h) == (4, 4) and len(frames) == 2
    want = [
        [GIF_PAL[3] if (r, c) == (1, 2) else GIF_PAL[0] for c in range(4)]
        for r in range(4)
    ]
    flat = bytes(v for row in want for p in row for v in p)
    assert frames[1][1] == flat
    assert frames[1][0] == 100  # delay carried per frame


def test_gif_strictness_falls_back_to_digest():
    idx = [[(x + y) % 4 for x in range(7)] for y in range(5)]
    rgb = [[GIF_PAL[i] for i in row] for row in idx]
    good = make_gif([idx], GIF_PAL)

    def is_digest(payload):
        return multimodal.decode_image_stub(payload) != expected_features(rgb)

    assert is_digest(good + b"x")  # junk after trailer
    assert is_digest(good[:-1])  # missing trailer
    assert is_digest(good[:20])  # truncated mid-structure
    # corrupt a byte inside the LZW data: decode must fail closed
    corrupted = bytearray(good)
    corrupted[-8] ^= 0x55
    assert is_digest(bytes(corrupted))


@given(st.integers(1, 24), st.integers(1, 24), st.integers(2, 8), st.booleans(), st.data())
@settings(max_examples=80, deadline=None)
def test_gif_roundtrip_random_images(w, h, n_colors, interlace, data):
    """Random dims x palette size x interlace: the LZW+palette round-trip
    must be EXACT (GIF is lossless)."""
    palette = [
        tuple(data.draw(st.integers(0, 255)) for _ in range(3))
        for _ in range(n_colors)
    ]
    idx = [
        [data.draw(st.integers(0, n_colors - 1)) for _ in range(w)]
        for _ in range(h)
    ]
    got = multimodal.decode_image_stub(make_gif([idx], palette, interlace=interlace))
    rgb = [[palette[i] for i in row] for row in idx]
    assert got == expected_features(rgb), (w, h, n_colors, interlace)


# ---------------------------------------------------------------------------
# IMA ADPCM WAV: independent encoder (the standard quantizer) vs the
# decoder's step-table reconstruction.
# ---------------------------------------------------------------------------

IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def make_adpcm_wav(samples_by_ch, rate=8000, data_bytes_per_ch=4):
    """Encode per-channel int16 sample lists as block-structured IMA ADPCM
    (format 0x11) using the standard quantizer. Each block holds
    1 + 2*data_bytes_per_ch samples per channel."""
    import struct

    n_ch = len(samples_by_ch)
    spb = 1 + 2 * data_bytes_per_ch  # samples per channel per block
    block_align = 4 * n_ch + data_bytes_per_ch * n_ch
    assert data_bytes_per_ch % 4 == 0 or n_ch == 1

    idxs = [0] * n_ch
    blocks = bytearray()
    n = len(samples_by_ch[0])
    for start in range(0, n, spb):
        chunk = [ch[start : start + spb] for ch in samples_by_ch]
        if len(chunk[0]) < spb:
            break  # encoder emits whole blocks only
        nibbles = [[] for _ in range(n_ch)]
        for c in range(n_ch):
            pred = chunk[c][0]
            blocks += struct.pack("<hBB", pred, idxs[c], 0)
            for s in chunk[c][1:]:
                step = IMA_STEPS[idxs[c]]
                diff = s - pred
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                vpdiff = step >> 3
                if diff >= step:
                    nib |= 4
                    diff -= step
                    vpdiff += step
                step >>= 1
                if diff >= step:
                    nib |= 2
                    diff -= step
                    vpdiff += step
                step >>= 1
                if diff >= step:
                    nib |= 1
                    vpdiff += step
                pred += -vpdiff if nib & 8 else vpdiff
                pred = max(-32768, min(32767, pred))
                idxs[c] = max(0, min(88, idxs[c] + IMA_INDEX[nib & 7]))
                nibbles[c].append(nib)
        # all channel headers are already appended; now the interleaved
        # 4-byte-per-channel nibble groups
        pos = 0
        while pos < 2 * data_bytes_per_ch:
            for c in range(n_ch):
                four = nibbles[c][pos : pos + 8]
                for i in range(0, 8, 2):
                    lo = four[i] if i < len(four) else 0
                    hi = four[i + 1] if i + 1 < len(four) else 0
                    blocks.append(lo | (hi << 4))
            pos += 8

    fmt = struct.pack(
        "<HHIIHHHH", 0x11, n_ch, rate, rate * block_align // spb,
        block_align, 4, 2, spb,
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    if len(blocks) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_adpcm_hand_computed_vector():
    """Ground truth from the published step tables, computed by hand:
    predictor 0, index 0 (step 7); nibble 2 -> +3; nibble 0xF -> -11."""
    import struct

    block = struct.pack("<hBB", 0, 0, 0) + bytes([0xF2, 0, 0, 0])
    parse = multimodal._make_wav_parser()
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000, 8, 4, 2, 9)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(block)) + block
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    n_ch, rate, samples = parse(wav)
    assert (n_ch, rate) == (1, 8000)
    assert samples[0] == 0  # block header predictor is sample 0
    assert samples[1] == 3  # step 7: diff = 7>>1 = 3, index -1 -> clamp 0
    assert samples[2] == -8  # 0xF: -(0 + 7 + 3 + 1) = -11 from 3
    assert len(samples) == 9


def test_adpcm_roundtrip_tracks_waveform():
    """The encoder/decoder pair must track a band-limited waveform within
    adaptive-step error; exact sample count/channels/rate preserved."""
    import math

    n = 81  # 1 header + 80 nibbles at 40 data bytes per channel
    mono = [int(8000 * math.sin(2 * math.pi * i / 32)) for i in range(n)]
    wav = make_adpcm_wav([mono], data_bytes_per_ch=40)
    n_ch, rate, samples = multimodal._make_wav_parser()(wav)
    assert (n_ch, rate, len(samples)) == (1, 8000, n)
    # the adaptive quantizer starts cold at index 0 and must slew its step
    # up toward the signal — large attack error is CORRECT ADPCM behavior;
    # after convergence (~16 samples here) tracking is tight
    errs = [abs(a - b) for a, b in zip(samples, mono)]
    assert max(errs[16:]) < 600, max(errs[16:])

    stereo_l = mono
    stereo_r = [-v for v in mono]
    wav2 = make_adpcm_wav([stereo_l, stereo_r], data_bytes_per_ch=40)
    n_ch2, _rate2, s2 = multimodal._make_wav_parser()(wav2)
    assert n_ch2 == 2 and len(s2) == 2 * n
    errl = [abs(a - b) for a, b in zip(s2[0::2], stereo_l)]
    errr = [abs(a - b) for a, b in zip(s2[1::2], stereo_r)]
    assert max(errl[16:]) < 600 and max(errr[16:]) < 600

    # the feature path flows through the same decode
    feat = multimodal.decode_image_stub(wav)
    assert feat[0] == 1.0 and feat[1] == 8000.0 and feat[2] == float(n)


def test_wav_truly_unsupported_codec_still_raises():
    import struct

    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 0)  # MP3 in WAV
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(NotImplementedError, match="audio"):
        multimodal.decode_image_stub(wav)


# EOB-run symbols (r<<4 | 0) for progressive AC scans
JPEG_AC_SYMBOLS_PROG = sorted(set(JPEG_AC_SYMBOLS) | {r << 4 for r in range(16)})


def make_progressive_jpeg(pixels, sampling=(1, 1), gray=False, al=1,
                          spectral_split=6):
    """Progressive JFIF encoder (SOF2): interleaved DC first scan at
    successive-approximation Al, DC refinement scans down to 0, per-component
    AC first scans split at ``spectral_split`` (two spectral bands), then AC
    refinement scans — the full spec G.1.2 scan script. Flat Huffman tables
    (DC cats at 4 bits, AC symbols incl. EOBn at 8 bits); EOB runs span
    consecutive all-zero blocks."""
    import struct

    import numpy as np

    h, w = len(pixels), len(pixels[0])
    rgb = np.array([[list(p) for p in row] for row in pixels], dtype=np.float64)
    A = np.array(
        [
            [
                (1 / np.sqrt(2) if u == 0 else 1.0) / 2.0
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for u in range(8)
            ]
            for x in range(8)
        ]
    )
    if gray:
        comps = [(1, 1, 1)]
        planes = {1: 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]}
    else:
        hs, vs = sampling
        comps = [(1, hs, vs), (2, 1, 1), (3, 1, 1)]
        planes = {
            1: 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2],
            2: -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1]
            + 0.5 * rgb[..., 2] + 128,
            3: 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1]
            - 0.081312 * rgb[..., 2] + 128,
        }
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    def prep(plane, chs, cvs):
        if (chs, cvs) != (hmax, vmax):
            fy, fx = vmax // cvs, hmax // chs
            ph = -(-plane.shape[0] // fy) * fy
            pw = -(-plane.shape[1] // fx) * fx
            p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge")
            plane = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcus_y * cvs * 8, mcus_x * chs * 8
        return np.pad(plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])), mode="edge")

    # quantized zigzag coefficient blocks per component, (bx,by) -> [64]
    blocks = {}
    grids = {}
    for cid, chs, cvs in comps:
        pl = prep(planes[cid], chs, cvs)
        nbx, nby = pl.shape[1] // 8, pl.shape[0] // 8
        grids[cid] = (nbx, nby)
        bl = {}
        for by in range(nby):
            for bx in range(nbx):
                g = pl[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                F = np.round(A.T @ g @ A).astype(int)  # quant all-ones
                bl[(bx, by)] = [int(F.flat[JPEG_ZZ[k]]) for k in range(64)]
        blocks[cid] = bl

    # --- bit writer (per scan)
    bits = []

    def put(v, n):
        for i in range(n - 1, -1, -1):
            bits.append((v >> i) & 1)

    def huff_dc(cat):
        put(cat, 4)

    def huff_ac(sym):
        put(JPEG_AC_SYMBOLS_PROG.index(sym), 8)

    def flush():
        bb = bits[:]
        while len(bb) % 8:
            bb.append(1)
        raw = bytearray()
        for i in range(0, len(bb), 8):
            byte = 0
            for bt in bb[i : i + 8]:
                byte = (byte << 1) | bt
            raw.append(byte)
            if byte == 0xFF:
                raw.append(0x00)
        bits.clear()
        return bytes(raw)

    def cat_of(v):
        return 0 if v == 0 else int(abs(v)).bit_length()

    def put_val(v, t):
        if t:
            put(v if v >= 0 else v + (1 << t) - 1, t)

    def pt(v, shift):  # point transform: toward-zero shift (spec G.1.2.2)
        return v >> shift if v >= 0 else -((-v) >> shift)

    scans = []  # (scan_header_bytes, entropy_bytes)

    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    def sos(comp_ids, ss, se, ah, al_):
        body = bytes([len(comp_ids)]) + b"".join(
            bytes((cid, 0x00)) for cid in comp_ids
        ) + bytes((ss, se, (ah << 4) | al_))
        return seg(0xDA, body)

    # scan 1: interleaved DC first at Al=al
    preds = {cid: 0 for cid, *_ in comps}
    for u in range(mcus_x * mcus_y):
        my, mx = divmod(u, mcus_x)
        for cid, chs, cvs in comps:
            for byi in range(cvs):
                for bxi in range(chs):
                    dc = pt(blocks[cid][(mx * chs + bxi, my * cvs + byi)][0], al)
                    diff = dc - preds[cid]
                    preds[cid] = dc
                    t = cat_of(diff)
                    huff_dc(t)
                    put_val(diff, t)
    scans.append((sos([c[0] for c in comps], 0, 0, 0, al), flush()))

    # DC refinement scans: one bit per block, Al descending
    for a in range(al - 1, -1, -1):
        for u in range(mcus_x * mcus_y):
            my, mx = divmod(u, mcus_x)
            for cid, chs, cvs in comps:
                for byi in range(cvs):
                    for bxi in range(chs):
                        put((blocks[cid][(mx * chs + bxi, my * cvs + byi)][0] >> a) & 1, 1)
        scans.append((sos([c[0] for c in comps], 0, 0, a + 1, a), flush()))

    # AC scans per component: two spectral bands, first at Al=al
    bands = [(1, spectral_split - 1), (spectral_split, 63)]
    bands = [(s, e) for s, e in bands if s <= e]
    for cid, chs, cvs in comps:
        nbx, nby = grids[cid]
        order = [(bx, by) for by in range(nby) for bx in range(nbx)]
        for ss, se in bands:
            eobrun = 0

            def flush_eobrun():
                nonlocal eobrun
                while eobrun > 0:
                    r = min(eobrun.bit_length() - 1, 14)
                    huff_ac(r << 4)
                    put(eobrun - (1 << r), r)
                    eobrun = 0

            for pos_ in order:
                zz = blocks[cid][pos_]
                vals = [pt(zz[k], al) for k in range(ss, se + 1)]
                if not any(vals):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
                    continue
                flush_eobrun()
                run = 0
                last_nz = max(i for i, v in enumerate(vals) if v)
                for i in range(last_nz + 1):
                    v = vals[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        huff_ac(0xF0)
                        run -= 16
                    s = cat_of(v)
                    huff_ac((run << 4) | s)
                    put_val(v, s)
                    run = 0
                if last_nz < se - ss:
                    eobrun += 1
            flush_eobrun()
            scans.append((sos([cid], ss, se, 0, al), flush()))

    # AC refinement scans (spec G.1.2.3, IJG encode_mcu_AC_refine shape)
    for a in range(al - 1, -1, -1):
        for cid, chs, cvs in comps:
            nbx, nby = grids[cid]
            order = [(bx, by) for by in range(nby) for bx in range(nbx)]
            for ss, se in bands:
                eobrun = 0
                pending_br = []

                def flush_eob_and_br():
                    nonlocal eobrun
                    while eobrun > 0:
                        r = min(eobrun.bit_length() - 1, 14)
                        huff_ac(r << 4)
                        put(eobrun - (1 << r), r)
                        eobrun = 0
                    for bt in pending_br:
                        put(bt, 1)
                    pending_br.clear()

                for pos_ in order:
                    zz = blocks[cid][pos_]
                    absv = [abs(pt(zz[k], a)) for k in range(ss, se + 1)]
                    newly = [i for i, v in enumerate(absv) if v == 1]
                    eob_i = newly[-1] if newly else -1
                    r = 0
                    br = []
                    for i, v in enumerate(absv):
                        if v == 0:
                            r += 1
                            continue
                        # ZRL flush runs for ANY nonzero coefficient — IJG
                        # encode_mcu_AC_refine tests `r > 15 && k <= EOB`
                        # BEFORE the history branch, so correction bits for
                        # history coefficients beyond a 16-zero span land in
                        # the clump after the ZRL, not the one before it.
                        while r > 15 and i <= eob_i:
                            flush_eob_and_br()
                            huff_ac(0xF0)
                            r -= 16
                            for bt in br:
                                put(bt, 1)
                            br.clear()
                        if v > 1:
                            # history coefficient: buffered correction bit
                            br.append((abs(zz[ss + i]) >> a) & 1)
                            continue
                        # newly significant (|v| == 1)
                        flush_eob_and_br()
                        huff_ac((r << 4) | 1)
                        put(1 if zz[ss + i] > 0 else 0, 1)
                        for bt in br:
                            put(bt, 1)
                        br.clear()
                        r = 0
                    if r > 0 or br:
                        eobrun += 1
                        pending_br.extend(br)
                        if eobrun == 0x7FFF:
                            flush_eob_and_br()
                flush_eob_and_br()
                scans.append((sos([cid], ss, se, a + 1, a), flush()))

    dc_counts = [0] * 16
    dc_counts[3] = 12
    ac_counts = [0] * 16
    ac_counts[7] = len(JPEG_AC_SYMBOLS_PROG)
    dht = seg(
        0xC4,
        bytes([0x00] + dc_counts) + bytes(range(12))
        + bytes([0x10] + ac_counts) + bytes(JPEG_AC_SYMBOLS_PROG),
    )
    sof_body = struct.pack(">BHHB", 8, h, w, len(comps)) + b"".join(
        bytes((cid, (chs << 4) | cvs, 0)) for cid, chs, cvs in comps
    )
    out = (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(0xC2, sof_body)
        + dht
    )
    for hdr, data in scans:
        out += hdr + data
    return out + b"\xff\xd9"


def test_progressive_jpeg_roundtrip_444():
    """Full progressive scan script (DC Al=1 + refine, two AC bands at
    Al=1 + refines) must reconstruct the image as well as baseline."""
    w, h, rgb = _jpeg_pixels(make_progressive_jpeg(GRAD_16))
    assert (w, h) == (16, 16)
    assert _max_err(rgb, GRAD_16) <= 4


def test_progressive_jpeg_grayscale():
    gray = [[(v, v, v) for v, _, _ in row] for row in GRAD_16]
    w, h, rgb = _jpeg_pixels(make_progressive_jpeg(gray, gray=True))
    assert _max_err(rgb, gray) <= 3


def test_progressive_jpeg_420():
    w, h, rgb = _jpeg_pixels(make_progressive_jpeg(SMOOTH_16, sampling=(2, 2)))
    assert _max_err(rgb, SMOOTH_16) <= 16


def test_progressive_jpeg_no_successive_approximation():
    """Spectral selection only (Al=0): DC scan + AC band scans, no
    refinement passes at all."""
    w, h, rgb = _jpeg_pixels(make_progressive_jpeg(GRAD_16, al=0))
    assert _max_err(rgb, GRAD_16) <= 4


def test_progressive_jpeg_odd_dims_and_split():
    pix = [row[:11] for row in GRAD_16[:13]]
    w, h, rgb = _jpeg_pixels(make_progressive_jpeg(pix, spectral_split=20))
    assert (w, h) == (11, 13)
    assert _max_err(rgb, pix) <= 4


@given(
    st.integers(1, 20),
    st.integers(1, 20),
    st.sampled_from([(1, 1), (2, 2)]),
    st.integers(0, 2),
    st.integers(2, 40),
    st.data(),
)
@settings(max_examples=40, deadline=None)
def test_progressive_jpeg_roundtrip_random(w, h, sampling, al, split, data):
    """Random dims x sampling x successive-approximation depth x spectral
    split point: progressive must reconstruct like baseline (solid color
    when chroma is subsampled, random pixels at 4:4:4)."""
    if sampling == (1, 1):
        pixels = [
            [tuple(data.draw(st.integers(0, 255)) for _ in range(3)) for _ in range(w)]
            for _ in range(h)
        ]
        tol = 6
    else:
        p = tuple(data.draw(st.integers(0, 255)) for _ in range(3))
        pixels = [[p] * w for _ in range(h)]
        tol = 4
    payload = make_progressive_jpeg(pixels, sampling=sampling, al=al, spectral_split=split)
    img = multimodal._make_jpeg_parser()(payload)
    assert img is not None, (w, h, sampling, al, split)
    dw, dh, rgb = img
    assert (dw, dh) == (w, h)
    assert _max_err(rgb, pixels) <= tol, (w, h, sampling, al, split)


# 4x17 RGB pixels (row-major, 3 bytes each) that historically desynced the
# AC-refinement bitstream: >15 zero-history positions precede a history
# (|v|>1) coefficient, so an encoder that defers the ZRL flush to the
# newly-significant branch dumps the history correction bits into the wrong
# bit clump (encoder bug fixed above; spec G.1.2.3 / IJG
# encode_mcu_AC_refine). Fixed bytes so the case survives Hypothesis
# database resets and any RNG drift.
_PROG_ZRL_REGRESSION_PIXELS = bytes.fromhex(
    "6b84c50d6370ca0282b65b0d9625bb0437d9b2d831c8998822ebdc83a4001760"
    "f6c3a090c6b3f545dd245898937832cbf12dd51108d602c140713ce167747b43"
    "2dfaa98f6f60485b57b9a4925b143e6c207118343b36ebe8b6886840a25e9722"
    "2cec22940d315f6ac24cff40ae4a6ce367a8ade5be1cf579ecae09c6278e6f01"
    "b50ebcd3742df51e44148a8f2be21e3f42a47e9da5369990f63d4b1227b06775"
    "568ac100080995f669be52ea46a4b66ae4bfb026fc860805def1bedd0ef6e96a"
    "fad80249b32ebd8b61edb587"
)


def test_progressive_jpeg_zrl_history_correction_regression():
    """Regression: Al=1 / 4:4:4 / spectral split 2 image whose AC
    refinement needs a ZRL flush before a history-coefficient correction
    bit. The pre-fix test encoder desynced here and the decoder (rightly)
    returned None."""
    w, h = 4, 17
    it = iter(_PROG_ZRL_REGRESSION_PIXELS)
    pixels = [
        [tuple(next(it) for _ in range(3)) for _ in range(w)] for _ in range(h)
    ]
    payload = make_progressive_jpeg(pixels, sampling=(1, 1), al=1, spectral_split=2)
    img = multimodal._make_jpeg_parser()(payload)
    assert img is not None
    dw, dh, rgb = img
    assert (dw, dh) == (w, h)
    assert _max_err(rgb, pixels) <= 6


def test_frame_features_null_duration_opaque_payload(spark):
    """NULL duration_ms on an opaque video payload: Arrow->pandas renders
    the nullable long as NaN — must emit the single ts=0 digest row, not
    crash the task (regression: int(NaN) ValueError)."""
    rows = [(72, "video", b"not-a-container", "video/mp4", None, None, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_frame_features(media, every_ms=1000).collect()
    assert [(r["frame_ts_ms"], r["frame_index"]) for r in out] == [(0, 0)]
    assert len(out[0]["feature"]) == multimodal.FEATURE_DIM


def test_gif_disposal2_out_of_range_bg_index_no_corruption():
    """disposal=2 with bg_index past the palette end must not shrink the
    canvas (regression: short-slice assignment deleted bytes)."""
    f1 = [[0] * 4 for _ in range(4)]
    f2 = [[1] * 4 for _ in range(4)]
    gif = make_gif(
        [f1, f2], GIF_PAL[:2], delays_ms=[100, 100], disposals=[2, 0],
        bg_index=9,
    )
    parsed = multimodal._make_gif_parser()(gif)
    assert parsed is not None
    w, h, frames = parsed
    assert all(len(rgb) == w * h * 3 for _d, rgb in frames)


def test_adpcm_uneven_channel_groups_fall_back_to_digest():
    """Stereo block_align whose nibble area is not a whole number of
    4-byte-per-channel groups is structurally invalid -> None (digest),
    not an IndexError (regression)."""
    import struct

    block = struct.pack("<hBB", 0, 0, 0) * 2 + b"\x00" * 4  # align 12, 2ch
    fmt = struct.pack("<HHIIHHHH", 0x11, 2, 8000, 8000, 12, 4, 2, 9)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(block)) + block
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert multimodal._make_wav_parser()(wav) is None


def test_feature_math_single_source():
    """extract_features and extract_frame_features must share the feature
    implementation (one factory), not parallel copies."""
    import inspect

    src = inspect.getsource(multimodal)
    assert src.count("def pixel_feature(") == 1
    assert src.count("def digest_vec(") == 1


# ---------------------------------------------------------------------------
# audio_spectral_features: real framed FFT analysis
# ---------------------------------------------------------------------------


def test_spectral_pure_tone_centroid_and_flatness(spark):
    """A pure sine at bin-aligned f0 must yield centroid ~= f0, rolloff
    ~= f0 and near-zero flatness; white-ish noise must be much flatter."""
    import math
    import random

    from wsspark.llmops.multimodal import audio_spectral_features

    rate, n = 8000, 4096
    f0 = 1000.0  # exactly bin 32 of a 256-point FFT at 8 kHz
    tone = [int(20000 * math.sin(2 * math.pi * f0 * i / rate)) for i in range(n)]
    rng = random.Random(7)
    noise = [rng.randint(-20000, 20000) for _ in range(n)]
    media = spark.createDataFrame(
        [(1, bytearray(make_wav(tone))), (2, bytearray(make_wav(noise)))],
        "media_id long, payload binary",
    )
    rows = {
        r.media_id: r
        for r in audio_spectral_features(media, n_fft=256, hop=128).collect()
    }
    t, z = rows[1], rows[2]
    assert abs(t.centroid_hz - f0) < 25.0, t.centroid_hz
    assert abs(t.rolloff85_hz - f0) < 32.0, t.rolloff85_hz
    assert t.flatness < 0.01
    assert z.flatness > 0.2
    assert z.centroid_hz > 1500.0  # noise spreads energy across the band
    assert t.n_frames == 1 + (n - 256) // 128


def test_spectral_matches_naive_dft_single_frame(spark):
    """One exact frame (payload length == n_fft, so a single frame and the
    Hann window is the only transform): the operator's centroid must agree
    with a from-the-definition O(n^2) DFT computed in pure Python."""
    import cmath
    import math
    import random

    from wsspark.llmops.multimodal import audio_spectral_features

    n_fft, rate = 64, 8000
    rng = random.Random(11)
    samples = [rng.randint(-15000, 15000) for _ in range(n_fft)]
    media = spark.createDataFrame(
        [(1, bytearray(make_wav(samples, rate=rate)))],
        "media_id long, payload binary",
    )
    row = audio_spectral_features(media, n_fft=n_fft, hop=n_fft).first()

    x = [
        (s / 32768.0)
        * (0.5 - 0.5 * math.cos(2 * math.pi * i / (n_fft - 1)))
        for i, s in enumerate(samples)
    ]
    power = []
    for k in range(n_fft // 2 + 1):
        c = sum(
            xi * cmath.exp(-2j * math.pi * k * i / n_fft)
            for i, xi in enumerate(x)
        )
        power.append(abs(c) ** 2)
    freqs = [k * rate / n_fft for k in range(n_fft // 2 + 1)]
    want_centroid = sum(f * p for f, p in zip(freqs, power)) / sum(power)
    assert row.n_frames == 1
    assert abs(row.centroid_hz - want_centroid) < 1e-3


def test_spectral_non_audio_payload_yields_nulls(spark):
    from wsspark.llmops.multimodal import audio_spectral_features

    media = spark.createDataFrame(
        [(1, bytearray(b"not a wav")), (2, None)],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in audio_spectral_features(media).collect()}
    assert rows[1].centroid_hz is None and rows[1].n_frames is None
    assert rows[2].centroid_hz is None
    assert len(rows) == 2  # undecodable rows are KEPT for corpus accounting
