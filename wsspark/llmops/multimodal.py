"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is REAL: 24-bit BI_RGB BMP, binary PPM (P6), the
COMPLETE PNG still-image spec (all color types, 1/2/4/8/16-bit depths,
straight and Adam7-interlaced — stdlib zlib inflate + from-spec
unfiltering), baseline Huffman JPEG (from-spec pure-Python decoder:
DQT/DHT/SOF0/SOS, IDCT, chroma upsampling, YCbCr), full GIF87a/89a
(LZW, palettes, interlace, animation compositing), 16-bit PCM WAV, and
Motion-JPEG AVI payloads are parsed pixel-for-pixel inside the
mapInPandas body and reduced to exact statistics — proving the Arrow
path end-to-end (bytes in, decoded features out). The remaining honest
``NotImplementedError`` boundaries are the profiles that genuinely need
codec libs: lossless/arithmetic/12-bit JPEG, non-PCM/non-IMA-ADPCM
WAV, non-MJPG AVI video codecs. Unknown payloads fall back to a
deterministic sha256 digest vector so the contract — schema, batching,
partitioning, UDF signature — stays testable on opaque testdata.
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


def _make_jpeg_parser():
    """From-spec Huffman JPEG (ITU-T T.81) decoder in pure Python:
    baseline (SOF0), extended sequential (SOF1), and PROGRESSIVE (SOF2)
    with full spectral selection + successive approximation (DC
    first/refine, AC first with EOB runs, AC refinement with correction
    bits — spec G.1.2); 8-bit precision, grayscale or YCbCr with any
    sampling factors, interleaved and single-component scans, DRI/RSTn
    restart markers. Coefficients accumulate across scans (zigzag,
    undequantized) and render once at EOI — baseline is just the
    one-scan case. Returns ``parse(b) -> (w, h, rgb)`` top-down
    row-major RGB, ``None`` for structurally-invalid payloads (the
    digest-fallback contract shared with BMP/PPM/PNG), and raises
    ``NotImplementedError`` only for lossless/hierarchical SOFs,
    arithmetic coding, and 12/16-bit precision. Chroma upsampling is
    libjpeg-parity triangle interpolation ("fancy" upsampling) for the
    2x ratios (h2v1/h2v2) and sample replication otherwise — the same
    policy as libjpeg's jdsample.c, so decodes track the
    libjpeg-family decoders real payloads are judged against
    (tests/fixtures/conformance); the IDCT is the textbook separable
    float DCT-III — all verified in tests/test_multimodal.py against
    independent numpy encoders for both sequential and progressive."""
    import math as _math
    import struct as _struct

    # zigzag scan order: index k in the stream -> natural 8x8 position.
    # Generated, not transcribed: diagonal s runs (0,s)->(s,0) for odd s
    # and (s,0)->(0,s) for even s, clamped to the 8x8 grid.
    def _zigzag():
        order = []
        for s in range(15):
            diag = [
                (s - j, j) for j in range(s + 1) if s - j < 8 and j < 8
            ]  # (row, col), row descending — the even-diagonal direction
            if s % 2:
                diag = diag[::-1]  # odd diagonals start at (0, s)
            order += [r * 8 + c for r, c in diag]
        return order

    _ZZ = _zigzag()

    # IDCT basis M[x][u] = c(u)/2 * cos((2x+1) u pi / 16)
    _M = [
        [
            ((1 / _math.sqrt(2)) if u == 0 else 1.0)
            / 2.0
            * _math.cos((2 * x + 1) * u * _math.pi / 16.0)
            for u in range(8)
        ]
        for x in range(8)
    ]

    class _Bad(Exception):
        pass

    def _build_huff(counts, symbols):
        """Canonical Huffman: (length, code) -> symbol."""
        tbl, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                if k >= len(symbols):
                    raise _Bad
                tbl[(ln, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        if k != len(symbols):
            raise _Bad
        return tbl

    def _idct(F_):  # 64 dequantized coeffs, natural order -> 64 pixel bytes
        tmp = [0.0] * 64
        for v in range(8):
            base = v * 8
            row = F_[base : base + 8]
            for x in range(8):
                mx = _M[x]
                tmp[base + x] = (
                    row[0] * mx[0]
                    + row[1] * mx[1]
                    + row[2] * mx[2]
                    + row[3] * mx[3]
                    + row[4] * mx[4]
                    + row[5] * mx[5]
                    + row[6] * mx[6]
                    + row[7] * mx[7]
                )
        out = bytearray(64)
        for y in range(8):
            my = _M[y]
            for x in range(8):
                s = (
                    my[0] * tmp[x]
                    + my[1] * tmp[8 + x]
                    + my[2] * tmp[16 + x]
                    + my[3] * tmp[24 + x]
                    + my[4] * tmp[32 + x]
                    + my[5] * tmp[40 + x]
                    + my[6] * tmp[48 + x]
                    + my[7] * tmp[56 + x]
                )
                v = int(round(s)) + 128
                out[y * 8 + x] = 0 if v < 0 else (255 if v > 255 else v)
        return out

    def parse(b: bytes):
        if b[:2] != b"\xff\xd8" or len(b) < 4:
            return None
        qt: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
        frame = None  # (w, h, [(cid, hs, vs, tq)])
        progressive = False
        restart_interval = 0
        # per-component DCT coefficients accumulate across scans (zigzag
        # order, undequantized) and render once at EOI — the architecture
        # progressive requires, and baseline is just its one-scan case
        coeffs: dict[int, dict[tuple[int, int], list[int]]] = {}
        dc_done: set[int] = set()
        decoded_any_scan = False
        pos = 2
        try:
            while True:
                if pos + 2 > len(b):
                    raise _Bad  # ran out before EOI
                if b[pos] != 0xFF:
                    raise _Bad
                while pos + 1 < len(b) and b[pos + 1] == 0xFF:
                    pos += 1  # fill bytes before a marker are legal
                if pos + 2 > len(b):
                    raise _Bad
                marker = b[pos + 1]
                pos += 2
                if marker == 0xD9:  # EOI — must terminate exactly
                    if pos != len(b) or not decoded_any_scan:
                        raise _Bad
                    break
                if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                    continue  # TEM / stray RST: standalone, no length
                if pos + 2 > len(b):
                    raise _Bad
                (seglen,) = _struct.unpack_from(">H", b, pos)
                if seglen < 2 or pos + seglen > len(b):
                    raise _Bad
                seg = b[pos + 2 : pos + seglen]
                pos += seglen
                if marker in (0xC0, 0xC1, 0xC2):
                    # SOF0 baseline / SOF1 extended-sequential (identical at
                    # 8-bit precision) / SOF2 progressive
                    if frame is not None or len(seg) < 6:
                        raise _Bad
                    progressive = marker == 0xC2
                    prec, h, w, ncomp = seg[0], (seg[1] << 8) | seg[2], (
                        seg[3] << 8
                    ) | seg[4], seg[5]
                    if prec != 8:
                        raise NotImplementedError(
                            "JPEG 12/16-bit precision decoding requires "
                            "codec libs, not available in this env"
                        )
                    if not (0 < w <= 1 << 15) or not (0 < h <= 1 << 15):
                        raise _Bad  # h == 0 (DNL-deferred) included
                    if ncomp not in (1, 3) or len(seg) != 6 + 3 * ncomp:
                        raise _Bad
                    comps = []
                    for i in range(ncomp):
                        cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                        hs, vs = hv >> 4, hv & 15
                        if not (1 <= hs <= 4 and 1 <= vs <= 4) or tq > 3:
                            raise _Bad
                        comps.append((cid, hs, vs, tq))
                    frame = (w, h, comps)
                elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                                0xCA, 0xCB, 0xCD, 0xCE, 0xCF, 0xCC):
                    raise NotImplementedError(
                        "JPEG lossless/hierarchical/arithmetic decoding "
                        "requires codec libs, not available in this env"
                    )
                elif marker == 0xC4:  # DHT, possibly several tables
                    p = 0
                    while p < len(seg):
                        if p + 17 > len(seg):
                            raise _Bad
                        tc, th = seg[p] >> 4, seg[p] & 15
                        if tc > 1 or th > 3:
                            raise _Bad
                        counts = list(seg[p + 1 : p + 17])
                        n = sum(counts)
                        if p + 17 + n > len(seg):
                            raise _Bad
                        huff[(tc, th)] = _build_huff(
                            counts, list(seg[p + 17 : p + 17 + n])
                        )
                        p += 17 + n
                elif marker == 0xDB:  # DQT, possibly several tables
                    p = 0
                    while p < len(seg):
                        pq, tq = seg[p] >> 4, seg[p] & 15
                        if tq > 3:
                            raise _Bad
                        if pq == 1:
                            raise NotImplementedError(
                                "JPEG 16-bit quantization tables (12-bit "
                                "profile) require codec libs, not "
                                "available in this env"
                            )
                        if pq != 0 or p + 65 > len(seg):
                            raise _Bad
                        qt[tq] = list(seg[p + 1 : p + 65])
                        p += 65
                elif marker == 0xDD:  # DRI
                    if len(seg) != 2:
                        raise _Bad
                    restart_interval = (seg[0] << 8) | seg[1]
                elif marker == 0xDA:  # SOS + entropy-coded data
                    if frame is None or len(seg) < 4:
                        raise _Bad
                    w, h, comps = frame
                    ns = seg[0]
                    if ns < 1 or ns > len(comps) or len(seg) != 4 + 2 * ns:
                        raise _Bad
                    hmax = max(c[1] for c in comps)
                    vmax = max(c[2] for c in comps)
                    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                    ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
                    if progressive:
                        is_dc = ss == 0
                        if is_dc:
                            if se != 0:
                                raise _Bad
                        else:
                            # AC scans carry exactly one component
                            if ns != 1 or not 1 <= ss <= se <= 63:
                                raise _Bad
                        if al > 13 or (ah != 0 and ah != al + 1):
                            raise _Bad
                    else:
                        if ss != 0 or se != 63 or ah != 0 or al != 0:
                            raise _Bad
                        is_dc = True  # sequential decodes DC+AC in one pass
                    scan_comps = []
                    for i in range(ns):
                        cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                        td, ta = tt >> 4, tt & 15
                        match = [c for c in comps if c[0] == cs]
                        if not match:
                            raise _Bad
                        cid, hs, vs, tq = match[0]
                        if tq not in qt:
                            raise _Bad
                        need_dc = (not progressive) or (is_dc and ah == 0)
                        need_ac = (not progressive) or not is_dc
                        if need_dc and (0, td) not in huff:
                            raise _Bad
                        if need_ac and (1, ta) not in huff:
                            raise _Bad
                        if progressive and not is_dc and cid not in dc_done:
                            raise _Bad  # spec: a DC scan must come first
                        coeffs.setdefault(cid, {})
                        scan_comps.append(
                            (
                                cid,
                                hs,
                                vs,
                                huff.get((0, td)),
                                huff.get((1, ta)),
                            )
                        )

                    # --- entropy-coded segment: bit reader with stuffing
                    bitbuf, bitcnt = 0, 0

                    def next_bit():
                        nonlocal pos, bitbuf, bitcnt
                        if bitcnt == 0:
                            if pos >= len(b):
                                raise _Bad
                            byte = b[pos]
                            if byte == 0xFF:
                                if pos + 1 >= len(b) or b[pos + 1] != 0x00:
                                    raise _Bad  # marker inside entropy data
                                pos += 2
                            else:
                                pos += 1
                            bitbuf, bitcnt = byte, 8
                        bitcnt -= 1
                        return (bitbuf >> bitcnt) & 1

                    def receive(n):
                        v = 0
                        for _ in range(n):
                            v = (v << 1) | next_bit()
                        return v

                    def extend(v, t):
                        return v if t == 0 or v >= (1 << (t - 1)) else (
                            v - (1 << t) + 1
                        )

                    def huffdec(tbl):
                        code = 0
                        for ln in range(1, 17):
                            code = (code << 1) | next_bit()
                            sym = tbl.get((ln, code))
                            if sym is not None:
                                return sym
                        raise _Bad

                    def blk(cid, bx, by):
                        c = coeffs[cid]
                        blk_ = c.get((bx, by))
                        if blk_ is None:
                            blk_ = [0] * 64
                            c[(bx, by)] = blk_
                        return blk_

                    def seq_block(coef, dt, at, pred):
                        t = huffdec(dt)
                        if t > 11:
                            raise _Bad
                        dc = pred + extend(receive(t), t)
                        coef[0] = dc
                        k = 1
                        while k < 64:
                            rs = huffdec(at)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63 or s > 10:
                                raise _Bad
                            coef[k] = extend(receive(s), s)
                            k += 1
                        return dc

                    def dc_first(coef, dt, pred):
                        t = huffdec(dt)
                        if t > 11:
                            raise _Bad
                        dc = pred + extend(receive(t), t)
                        coef[0] = dc << al
                        return dc

                    def dc_refine(coef):
                        if next_bit():
                            coef[0] |= 1 << al

                    def ac_first(coef, at):
                        nonlocal eobrun
                        if eobrun > 0:
                            eobrun -= 1
                            return
                        k = ss
                        while k <= se:
                            rs = huffdec(at)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r < 15:
                                    eobrun = (1 << r) - 1 + (
                                        receive(r) if r else 0
                                    )
                                    return
                                k += 16  # ZRL
                                continue
                            k += r
                            if k > se or s > 10:
                                raise _Bad
                            coef[k] = extend(receive(s), s) << al
                            k += 1

                    def ac_refine(coef, at):
                        nonlocal eobrun
                        p1, m1 = 1 << al, -1 << al

                        def correct(k):
                            # append the scan's bit to an already-nonzero
                            # coefficient (spec G.1.2.3)
                            if next_bit() and not (coef[k] & p1):
                                coef[k] += p1 if coef[k] > 0 else m1

                        k = ss
                        if eobrun == 0:
                            while k <= se:
                                rs = huffdec(at)
                                r, s = rs >> 4, rs & 15
                                val = 0
                                if s == 0:
                                    if r < 15:
                                        eobrun = (1 << r) + (
                                            receive(r) if r else 0
                                        )
                                        break
                                    # ZRL: r = 15 -> skip 16 zero-history
                                else:
                                    if s != 1:
                                        raise _Bad
                                    val = p1 if next_bit() else m1
                                while k <= se:
                                    if coef[k]:
                                        correct(k)
                                    else:
                                        if r == 0:
                                            break
                                        r -= 1
                                    k += 1
                                if val and k <= se:
                                    coef[k] = val
                                k += 1
                        if eobrun > 0:
                            # finish this block with correction bits only
                            while k <= se:
                                if coef[k]:
                                    correct(k)
                                k += 1
                            eobrun -= 1

                    def expect_restart(m):
                        nonlocal pos, bitbuf, bitcnt
                        bitbuf, bitcnt = 0, 0  # align to byte boundary
                        if (
                            pos + 2 > len(b)
                            or b[pos] != 0xFF
                            or b[pos + 1] != 0xD0 + m
                        ):
                            raise _Bad
                        pos += 2

                    preds = {cid: 0 for cid, *_ in scan_comps}
                    eobrun = 0
                    rst_m, since_rst = 0, 0

                    def maybe_restart():
                        nonlocal rst_m, since_rst, eobrun
                        since_rst += 1
                        if restart_interval and since_rst == restart_interval:
                            expect_restart(rst_m)
                            rst_m = (rst_m + 1) & 7
                            since_rst = 0
                            eobrun = 0
                            for c in preds:
                                preds[c] = 0

                    def decode_unit(cid, dt, at, bx, by):
                        coef = blk(cid, bx, by)
                        if not progressive:
                            preds[cid] = seq_block(coef, dt, at, preds[cid])
                        elif is_dc:
                            if ah == 0:
                                preds[cid] = dc_first(coef, dt, preds[cid])
                            else:
                                dc_refine(coef)
                        else:
                            if ah == 0:
                                ac_first(coef, at)
                            else:
                                ac_refine(coef, at)

                    if ns == 1:
                        # non-interleaved: one block per unit over the
                        # component's own used block grid
                        cid, hs, vs, dt, at = scan_comps[0]
                        cw = (w * hs + hmax - 1) // hmax
                        chh = (h * vs + vmax - 1) // vmax
                        nbx, nby = (cw + 7) // 8, (chh + 7) // 8
                        n_units = nbx * nby
                        for u in range(n_units):
                            by, bx = divmod(u, nbx)
                            decode_unit(cid, dt, at, bx, by)
                            if u != n_units - 1:
                                maybe_restart()
                    else:
                        n_units = mcus_x * mcus_y
                        for u in range(n_units):
                            my, mx = divmod(u, mcus_x)
                            for cid, hs, vs, dt, at in scan_comps:
                                for byi in range(vs):
                                    for bxi in range(hs):
                                        decode_unit(
                                            cid,
                                            dt,
                                            at,
                                            mx * hs + bxi,
                                            my * vs + byi,
                                        )
                            if u != n_units - 1:
                                maybe_restart()
                    if not progressive or is_dc:
                        for cid, *_ in scan_comps:
                            dc_done.add(cid)
                    decoded_any_scan = True
                elif 0xE0 <= marker <= 0xEF or marker == 0xFE:
                    continue  # APPn / COM
                else:
                    raise _Bad  # DNL and friends: structurally unsupported
        except _Bad:
            return None
        if frame is None:
            return None
        w, h, comps = frame
        if any(c[0] not in dc_done for c in comps):
            return None  # a component never got a (DC) scan
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
        # render: dequantize + IDCT every accumulated block (blocks no scan
        # touched stay all-zero -> flat 128 after level shift)
        planes: dict[int, bytearray] = {}
        plane_dims: dict[int, tuple[int, int]] = {}
        zero_px = None
        for cid, hs, vs, tq in comps:
            if tq not in qt:
                return None
            q = qt[tq]
            pw, ph = mcus_x * hs * 8, mcus_y * vs * 8
            plane = bytearray(pw * ph)
            for (bx, by), zz in coeffs.get(cid, {}).items():
                if bx * 8 >= pw or by * 8 >= ph:
                    return None
                nat = [0] * 64
                for k in range(64):
                    if zz[k]:
                        nat[_ZZ[k]] = zz[k] * q[k]
                px = _idct(nat)
                ox, oy = bx * 8, by * 8
                for yy in range(8):
                    row = (oy + yy) * pw + ox
                    plane[row : row + 8] = px[yy * 8 : yy * 8 + 8]
            if zero_px is None:
                zero_px = _idct([0] * 64)[0]  # 128
            # untouched plane bytes are 0; set them to the zero-block value
            touched = coeffs.get(cid, {})
            for byy in range(ph // 8):
                for bxx in range(pw // 8):
                    if (bxx, byy) not in touched:
                        for yy in range(8):
                            row = (byy * 8 + yy) * pw + bxx * 8
                            for xx in range(8):
                                plane[row + xx] = zero_px
            planes[cid] = plane
            plane_dims[cid] = (pw, ph)
        out = bytearray(w * h * 3)
        if len(comps) == 1:
            cid = comps[0][0]
            pw, _ph = plane_dims[cid]
            plane = planes[cid]
            for y in range(h):
                row = y * pw
                o = y * w * 3
                for x in range(w):
                    g = plane[row + x]
                    out[o : o + 3] = bytes((g, g, g))
                    o += 3
            return w, h, bytes(out)
        (cy, hy, vy, _), (cb, hb, vb, _), (cr, hr, vr, _) = comps

        def _fancy_rows(plane, pw, cw, chh, fy):
            """libjpeg jdsample.c triangle upsampling (h2v1_fancy /
            h2v2_fancy, horizontal ratio 2 only — the caller gates on
            fx == 2): 3/4-1/4 weighting toward the nearer sample with
            libjpeg's exact rounding biases, edge samples clamped. Returns
            a list of full-resolution rows (fy*chh rows of 2*cw bytes)."""
            out = []
            if fy == 2:
                for j in range(2 * chh):
                    jn = j >> 1
                    jf = jn + (1 if (j & 1) else -1)
                    jf = 0 if jf < 0 else (chh - 1 if jf >= chh else jf)
                    r0, r1 = jn * pw, jf * pw
                    t = [plane[r0 + i] * 3 + plane[r1 + i] for i in range(cw)]
                    row = bytearray(2 * cw)
                    if cw == 1:
                        row[0] = (t[0] * 4 + 8) >> 4
                        row[1] = (t[0] * 4 + 7) >> 4
                    else:
                        row[0] = (t[0] * 4 + 8) >> 4
                        row[1] = (t[0] * 3 + t[1] + 7) >> 4
                        for i in range(1, cw - 1):
                            row[2 * i] = (t[i] * 3 + t[i - 1] + 8) >> 4
                            row[2 * i + 1] = (t[i] * 3 + t[i + 1] + 7) >> 4
                        row[2 * cw - 2] = (t[cw - 1] * 3 + t[cw - 2] + 8) >> 4
                        row[2 * cw - 1] = (t[cw - 1] * 4 + 7) >> 4
                    out.append(row)
                return out
            for j in range(chh):
                s = plane[j * pw : j * pw + cw]
                row = bytearray(2 * cw)
                if cw == 1:
                    row[0] = row[1] = s[0]
                else:
                    row[0] = s[0]
                    row[1] = (s[0] * 3 + s[1] + 2) >> 2
                    for i in range(1, cw - 1):
                        row[2 * i] = (s[i] * 3 + s[i - 1] + 1) >> 2
                        row[2 * i + 1] = (s[i] * 3 + s[i + 1] + 2) >> 2
                    row[2 * cw - 2] = (s[cw - 1] * 3 + s[cw - 2] + 1) >> 2
                    row[2 * cw - 1] = s[cw - 1]
                out.append(row)
            return out

        def _sampler(cid, hc, vc):
            """Full-resolution sample accessor for one component: direct
            for full-size planes, libjpeg-parity fancy upsampling for the
            2x ratios, spec-legal replication for everything else (the
            same split libjpeg makes — only h2v1/h2v2 get the triangle
            filter)."""
            pw = plane_dims[cid][0]
            plane = planes[cid]
            if hc == hmax and vc == vmax:
                return lambda y, x: plane[y * pw + x]
            if hmax % hc == 0 and vmax % vc == 0:
                fx, fy = hmax // hc, vmax // vc
                if fx == 2 and fy in (1, 2):
                    cw = -(-(w * hc) // hmax)
                    chh = -(-(h * vc) // vmax)
                    rows = _fancy_rows(plane, pw, cw, chh, fy)
                    return lambda y, x: rows[y][x]
            return lambda y, x: plane[(y * vc // vmax) * pw + (x * hc // hmax)]

        sy_, sb_, sr_ = (
            _sampler(cy, hy, vy),
            _sampler(cb, hb, vb),
            _sampler(cr, hr, vr),
        )
        for y in range(h):
            o = y * w * 3
            for x in range(w):
                yv = sy_(y, x)
                cbv = sb_(y, x) - 128
                crv = sr_(y, x) - 128
                r = int(round(yv + 1.402 * crv))
                g = int(round(yv - 0.344136 * cbv - 0.714136 * crv))
                bl = int(round(yv + 1.772 * cbv))
                out[o] = 0 if r < 0 else (255 if r > 255 else r)
                out[o + 1] = 0 if g < 0 else (255 if g > 255 else g)
                out[o + 2] = 0 if bl < 0 else (255 if bl > 255 else bl)
                o += 3
        return w, h, bytes(out)

    return parse


def _make_pixel_parser():
    """Pure-Python parser for the formats decodable without codec
    libraries: uncompressed 24-bit BI_RGB BMP, binary P6 PPM, stdlib
    ``zlib`` making PNG a real inflate, and a from-spec baseline JPEG
    decoder (``_make_jpeg_parser``). Returns ``parse(payload) ->
    (w, h, rgb)`` where ``rgb`` is a flat top-down row-major bytes of
    RGB triples, ``None`` when the payload is not strictly valid
    (digest fallback), and raises ``NotImplementedError`` for
    structurally-valid variants that DO need a codec lib (JPEG
    lossless/arithmetic/12-bit — same honesty contract as exotic WAV
    codecs; PNG, GIF, and sequential+progressive JPEG decode
    completely). Strictness matters: header
    fields and PNG chunk CRCs are fully validated so random binary
    payloads (the synthetic testdata) can never false-positive into
    the decode path (probability ~2^-80; for PNG every chunk must
    clear a CRC32), keeping the sha256 fallback — and the driver
    oracle built on it — deterministic."""
    import struct as _struct
    import zlib as _zlib

    def _parse_bmp(b: bytes):
        if len(b) < 54:
            return None
        file_size, _r1, _r2, off = _struct.unpack_from("<IHHI", b, 2)
        hdr_size, w, h, planes, bpp, comp = _struct.unpack_from("<IiiHHI", b, 14)
        if (
            hdr_size != 40
            or planes != 1
            or bpp != 24
            or comp != 0  # BI_RGB only; RLE is a compressed codec
            or file_size != len(b)
            or not (0 < w <= 1 << 15)
            or not (0 < abs(h) <= 1 << 15)
        ):
            return None
        stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
        n_rows = abs(h)
        if off < 54 or off + stride * n_rows > len(b):
            return None
        # h > 0 means bottom-up row order; pixels are BGR
        row_ids = range(n_rows - 1, -1, -1) if h > 0 else range(n_rows)
        out = bytearray()
        for r in row_ids:
            row = b[off + r * stride : off + r * stride + w * 3]
            for i in range(0, w * 3, 3):
                out += bytes((row[i + 2], row[i + 1], row[i]))
        return w, n_rows, bytes(out)

    def _parse_ppm(b: bytes):
        # P6 <ws> width <ws> height <ws> maxval <one ws> raw RGB rows.
        # Symmetric strictness with the BMP parser (the ~2^-80
        # false-positive bound): the magic must be FOLLOWED by whitespace
        # (else b"P6123..." silently reads "123" as width), the single
        # byte after maxval must itself be whitespace, and the payload
        # length must be exactly header + w*h*3 (one optional trailing
        # newline tolerated) so trailing junk falls back to sha256.
        if not b[2:3].isspace():
            return None
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            start = pos
            while pos < len(b) and b[pos : pos + 1].isdigit():
                pos += 1
            if pos == start:
                return None
            fields.append(int(b[start:pos]))
        w, h, maxval = fields
        if maxval != 255 or not (0 < w <= 1 << 15) or not (0 < h <= 1 << 15):
            return None
        if not b[pos : pos + 1].isspace():
            return None
        pos += 1  # exactly one whitespace byte after maxval, per spec
        end = pos + w * h * 3
        if end > len(b):
            return None
        if len(b) > end and not (len(b) == end + 1 and b[end:] in (b"\n", b"\r")):
            return None
        return w, h, b[pos:end]

    _PNG_SIG = b"\x89PNG\r\n\x1a\n"

    def _paeth(a: int, up: int, c: int) -> int:
        p = a + up - c
        pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return up if pb <= pc else c

    # channels per PNG color type, and the bit depths the spec allows each
    _PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
    _PNG_DEPTHS = {
        0: (1, 2, 4, 8, 16),
        2: (8, 16),
        3: (1, 2, 4, 8),
        4: (8, 16),
        6: (8, 16),
    }

    def _parse_png(b: bytes):
        # Chunk walk with full CRC verification; IHDR first, IDAT
        # concatenated, IEND must terminate the payload exactly. Decodes
        # the complete still-image spec: truecolor (2), RGBA (6),
        # grayscale (0), gray+alpha (4), palette (3 via PLTE), every legal
        # depth 1/2/4/8/16, straight or Adam7-interlaced.
        if b[:8] != _PNG_SIG or len(b) < 8 + 12:
            return None
        pos, ihdr, idat, plte, seen_end = 8, None, [], None, False
        while pos + 12 <= len(b):
            (length,) = _struct.unpack_from(">I", b, pos)
            ctype = b[pos + 4 : pos + 8]
            if length > len(b) or pos + 12 + length > len(b):
                return None
            data = b[pos + 8 : pos + 8 + length]
            (crc,) = _struct.unpack_from(">I", b, pos + 8 + length)
            if _zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                return None
            pos += 12 + length
            if ihdr is None:
                if ctype != b"IHDR" or length != 13:
                    return None
                ihdr = data
            elif ctype == b"PLTE":
                # must precede IDAT, 1..256 RGB triples (png spec 11.2.3)
                if idat or plte is not None or length % 3 or not 0 < length <= 768:
                    return None
                plte = data
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                if length != 0:
                    return None
                seen_end = True
                break
        if ihdr is None or not seen_end or pos != len(b) or not idat:
            return None
        w, h, depth, ctype_, comp, filt, interlace = _struct.unpack(
            ">IIBBBBB", ihdr
        )
        if comp != 0 or filt != 0:
            return None
        if not (0 < w <= 1 << 15) or not (0 < h <= 1 << 15):
            return None
        if ctype_ not in _PNG_CHANNELS or depth not in _PNG_DEPTHS[ctype_]:
            return None
        if interlace not in (0, 1):
            return None
        if ctype_ == 3 and plte is None:
            return None
        if plte is not None and ctype_ in (0, 4):
            return None  # PLTE forbidden for grayscale types (spec 11.2.3)
        try:
            raw = _zlib.decompress(b"".join(idat))
        except _zlib.error:
            return None
        ch = _PNG_CHANNELS[ctype_]
        # sub-byte samples scale to 8-bit by bit replication (255/(2^d-1));
        # 16-bit samples reduce to their high byte (the spec's sanctioned
        # 16->8 approximation, spec 13.12)
        scale = 255 // ((1 << depth) - 1) if depth < 8 else 1
        n_pal = len(plte) // 3 if plte is not None else 0

        def unfilter(pass_w, pass_h, pos):
            """Unfilter ``pass_h`` scanlines of a (sub)image ``pass_w``
            pixels wide starting at raw[pos]. Filters operate on BYTES:
            stride is the packed row length and the left-neighbor distance
            bpp floors at one byte for sub-byte depths (png spec 9.2)."""
            stride = (pass_w * ch * depth + 7) // 8
            bpp = max(1, ch * depth // 8)
            rows = []
            prev = bytearray(stride)
            for _y in range(pass_h):
                if pos + 1 + stride > len(raw):
                    raise ValueError
                f = raw[pos]
                row = bytearray(raw[pos + 1 : pos + 1 + stride])
                pos += 1 + stride
                if f == 1:  # Sub
                    for i in range(bpp, stride):
                        row[i] = (row[i] + row[i - bpp]) & 0xFF
                elif f == 2:  # Up
                    for i in range(stride):
                        row[i] = (row[i] + prev[i]) & 0xFF
                elif f == 3:  # Average
                    for i in range(stride):
                        a = row[i - bpp] if i >= bpp else 0
                        row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
                elif f == 4:  # Paeth
                    for i in range(stride):
                        a = row[i - bpp] if i >= bpp else 0
                        c = prev[i - bpp] if i >= bpp else 0
                        row[i] = (row[i] + _paeth(a, prev[i], c)) & 0xFF
                elif f != 0:
                    raise ValueError
                prev = row
                rows.append(row)
            return rows, pos

        def row_rgb(row, n_px):
            """One unfiltered scanline -> n_px 3-byte RGB pixels."""
            if depth < 8:
                mask = (1 << depth) - 1
                vals = [
                    (row[(x * depth) // 8] >> (8 - depth - (x * depth) % 8))
                    & mask
                    for x in range(n_px)
                ]
                if ctype_ == 0:
                    return [bytes((v * scale,) * 3) for v in vals]
                pix = []
                for ix in vals:  # palette; out-of-range = corruption
                    if ix >= n_pal:
                        raise ValueError
                    pix.append(plte[3 * ix : 3 * ix + 3])
                return pix
            if depth == 16:
                row = row[0::2]  # big-endian samples: keep the high byte
            if ctype_ == 2:
                return [row[3 * x : 3 * x + 3] for x in range(n_px)]
            if ctype_ == 6:  # drop alpha
                return [row[4 * x : 4 * x + 3] for x in range(n_px)]
            if ctype_ == 0:
                return [bytes((row[x],) * 3) for x in range(n_px)]
            if ctype_ == 4:  # gray + alpha pairs; drop alpha
                return [bytes((row[2 * x],) * 3) for x in range(n_px)]
            pix = []
            for x in range(n_px):  # 8-bit palette
                ix = row[x]
                if ix >= n_pal:
                    raise ValueError
                pix.append(plte[3 * ix : 3 * ix + 3])
            return pix

        out = bytearray(w * h * 3)
        try:
            if interlace == 0:
                rows, pos = unfilter(w, h, 0)
                if pos != len(raw):
                    return None
                for y, row in enumerate(rows):
                    px = row_rgb(row, w)
                    o = y * w * 3
                    for x in range(w):
                        out[o + 3 * x : o + 3 * x + 3] = px[x]
            else:  # Adam7: 7 passes, each its own filtered sub-image
                pos = 0
                for x0, y0, dx, dy in (
                    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
                ):
                    pw = (w - x0 + dx - 1) // dx
                    ph = (h - y0 + dy - 1) // dy
                    if pw <= 0 or ph <= 0:
                        continue  # empty pass contributes NO bytes
                    rows, pos = unfilter(pw, ph, pos)
                    for r, row in enumerate(rows):
                        px = row_rgb(row, pw)
                        y = y0 + r * dy
                        for i in range(pw):
                            o = 3 * (y * w + x0 + i * dx)
                            out[o : o + 3] = px[i]
                if pos != len(raw):
                    return None
        except ValueError:
            return None
        return w, h, bytes(out)

    _parse_jpeg = _make_jpeg_parser()
    _parse_gif = _make_gif_parser()

    def parse(b: bytes):
        if b[:2] == b"BM":
            return _parse_bmp(b)
        if b[:2] == b"P6":
            return _parse_ppm(b)
        if b[:8] == _PNG_SIG:
            return _parse_png(b)
        if b[:2] == b"\xff\xd8":
            return _parse_jpeg(b)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            gif = _parse_gif(b)
            if gif is None:
                return None
            w, h, frames = gif
            return w, h, frames[0][1]  # static path: first composited frame
        return None

    return parse


def _make_wav_parser():
    """Pure-Python RIFF/WAVE parser for 16-bit PCM — the audio analog of
    the pixel parser. Returns ``parse(payload) -> (n_channels, rate,
    samples)`` with interleaved int16 samples, ``None`` for payloads that
    are not a structurally-valid WAV, and raises ``NotImplementedError``
    for valid WAVE containers holding a compressed codec (non-PCM fmt or
    non-16-bit) — same honesty contract as PNG/JPEG on the image side."""
    import struct as _struct

    def parse(b: bytes):
        if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        (riff_size,) = _struct.unpack_from("<I", b, 4)
        if riff_size + 8 != len(b):
            return None
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            (sz,) = _struct.unpack_from("<I", b, pos + 4)
            body = b[pos + 8 : pos + 8 + sz]
            if len(body) < sz:
                return None
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            pos += 8 + sz + (sz & 1)  # chunks pad to even offsets
        if fmt is None or data is None or len(fmt) < 16:
            return None
        audio_fmt, n_ch, rate, _br, block_align, bits = _struct.unpack_from(
            "<HHIIHH", fmt, 0
        )
        if not (1 <= n_ch <= 16) or rate <= 0:
            return None
        if audio_fmt == 0x11 and bits == 4:  # IMA ADPCM (DVI), from spec
            samples = _decode_ima_adpcm(data, n_ch, block_align)
            if samples is None:
                return None
            return n_ch, rate, samples
        if audio_fmt != 1 or bits != 16:
            raise NotImplementedError(
                "non-PCM/non-IMA-ADPCM audio decoding requires codec "
                "libs, not available in this env"
            )
        frame = 2 * n_ch
        if len(data) % frame:
            return None
        samples = _struct.unpack(f"<{len(data) // 2}h", data)
        return n_ch, rate, samples

    # IMA/DVI ADPCM step tables (the published constants ARE the spec)
    _IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)
    _IMA_STEPS = (
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    )

    def _decode_ima_adpcm(data, n_ch, block_align):
        """Block-structured IMA ADPCM: per block and channel a 4-byte
        header (int16 predictor, step index, reserved), then nibble data
        interleaved in 4-byte-per-channel groups; nibbles low-first."""
        if (
            block_align < 4 * n_ch
            or (block_align - 4 * n_ch) % (4 * n_ch)
            or len(data) % block_align
        ):
            return None
        out: list[list[int]] = []
        for base in range(0, len(data), block_align):
            block = data[base : base + block_align]
            preds, idxs = [], []
            chans: list[list[int]] = []
            for c in range(n_ch):
                p = _struct.unpack_from("<h", block, 4 * c)[0]
                ix = block[4 * c + 2]
                if ix > 88 or block[4 * c + 3] != 0:
                    return None
                preds.append(p)
                idxs.append(ix)
                chans.append([p])

            def step_one(c, nib):
                step = _IMA_STEPS[idxs[c]]
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                p = preds[c] + (-diff if nib & 8 else diff)
                p = -32768 if p < -32768 else (32767 if p > 32767 else p)
                preds[c] = p
                ix = idxs[c] + _IMA_INDEX[nib & 7]
                idxs[c] = 0 if ix < 0 else (88 if ix > 88 else ix)
                chans[c].append(p)

            pos2 = 4 * n_ch
            while pos2 < block_align:
                for c in range(n_ch):
                    for byte in block[pos2 + 4 * c : pos2 + 4 * c + 4]:
                        step_one(c, byte & 0x0F)
                        step_one(c, byte >> 4)
                pos2 += 4 * n_ch
            out.append(chans)
        # interleave channels per frame across blocks
        samples: list[int] = []
        for chans in out:
            n = len(chans[0])
            for i in range(n):
                for c in range(n_ch):
                    samples.append(chans[c][i])
        return tuple(samples)

    return parse


def _make_gif_parser():
    """From-spec GIF87a/89a decoder in pure Python: logical screen +
    global/local color tables, the LZW variable-code-size decompressor
    (GIF's defining codec — clear/EOI codes, dictionary growth to 4096,
    LSB-first packing), 4-pass interlace reordering, and frame compositing
    (disposal none/keep accumulate onto the canvas; disposal 2 restores
    the background; transparency skips pixels). Returns ``parse(b) ->
    (w, h, [(delay_ms, rgb_bytes), ...])`` — one entry per frame,
    composited, each ``rgb`` full-canvas top-down RGB — or ``None`` for
    structurally-invalid payloads (the digest-fallback contract: exact
    trailer at end-of-bytes, consistent sub-block chains, in-range LZW
    codes). Nothing in GIF needs an external codec lib, so this parser
    has no NotImplementedError surface — disposal 3 (restore-previous)
    is honored too since a previous-canvas copy is cheap at these sizes."""

    def _lzw(min_code: int, data: bytes, n_expected: int):
        if not 2 <= min_code <= 11:
            raise ValueError
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        # dictionary: entries as (prefix_index, last_byte); roots are bytes
        out = bytearray()
        bitpos = 0
        nbits = len(data) * 8

        def read_code(size):
            nonlocal bitpos
            if bitpos + size > nbits:
                raise ValueError
            v = 0
            for i in range(size):
                byte = data[(bitpos + i) >> 3]
                v |= ((byte >> ((bitpos + i) & 7)) & 1) << i  # LSB-first
            bitpos += size
            return v

        def reset():
            return list(range(1 << min_code)) + [None, None], min_code + 1

        table, size = reset()
        prev = None
        while True:
            code = read_code(size)
            if code == clear:
                table, size = reset()
                prev = None
                continue
            if code == eoi:
                break
            if code < len(table) and table[code] is not None or code < clear:
                entry = _expand(table, code)
            elif code == len(table) and prev is not None:
                entry = _expand(table, prev)
                entry = entry + entry[:1]
            else:
                raise ValueError
            out += entry
            if prev is not None and len(table) < 4096:
                table.append((prev, entry[0]))
                # The decoder's table lags the encoder by ONE pending entry
                # (the encoder adds right after emitting; the decoder only
                # learns that entry's last byte from the NEXT code), so the
                # size bump fires at 2^size - 1, not 2^size — the canonical
                # GIF-LZW off-by-one.
                if len(table) == (1 << size) - 1 and size < 12:
                    size += 1
            prev = code
            if len(out) >= n_expected:
                # spec: EOI should follow; tolerate it arriving next read
                nxt = read_code(size) if bitpos + size <= nbits else eoi
                if nxt not in (eoi, clear):
                    raise ValueError
                break
        if len(out) != n_expected:
            raise ValueError
        return bytes(out)

    def _expand(table, code):
        # walk the prefix chain; roots are ints (the byte value)
        parts = []
        while True:
            e = table[code]
            if isinstance(e, int):
                parts.append(e)
                break
            code, byte = e
            parts.append(byte)
        return bytes(reversed(parts))

    _INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))

    def parse(b: bytes):
        if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 14:
            return None
        w = b[6] | (b[7] << 8)
        h = b[8] | (b[9] << 8)
        packed, bg_index = b[10], b[11]
        if not (0 < w <= 1 << 14) or not (0 < h <= 1 << 14):
            return None
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 7)
            if pos + 3 * n > len(b):
                return None
            gct = b[pos : pos + 3 * n]
            pos += 3 * n

        def sub_blocks(p):
            chunks = []
            while True:
                if p >= len(b):
                    raise ValueError
                n = b[p]
                p += 1
                if n == 0:
                    return b"".join(chunks), p
                if p + n > len(b):
                    raise ValueError
                chunks.append(b[p : p + n])
                p += n

        canvas = bytearray(w * h * 3)
        if gct is not None and 3 * bg_index + 3 <= len(gct):
            bg = gct[3 * bg_index : 3 * bg_index + 3]
            for i in range(0, len(canvas), 3):
                canvas[i : i + 3] = bg
        frames: list[tuple[int, bytes]] = []
        delay_ms = 0
        transparent = None
        disposal = 0
        try:
            while True:
                if pos >= len(b):
                    return None  # no trailer
                block = b[pos]
                pos += 1
                if block == 0x3B:  # trailer — must end the payload exactly
                    if pos != len(b) or not frames:
                        return None
                    return w, h, frames
                if block == 0x21:  # extension
                    if pos >= len(b):
                        return None
                    label = b[pos]
                    pos += 1
                    data, pos = sub_blocks(pos)
                    if label == 0xF9:  # graphic control
                        if len(data) != 4:
                            return None
                        flags = data[0]
                        disposal = (flags >> 2) & 7
                        delay_ms = (data[1] | (data[2] << 8)) * 10
                        transparent = data[3] if flags & 1 else None
                    continue
                if block != 0x2C:
                    return None
                if pos + 9 > len(b):
                    return None
                fx = b[pos] | (b[pos + 1] << 8)
                fy = b[pos + 2] | (b[pos + 3] << 8)
                fw = b[pos + 4] | (b[pos + 5] << 8)
                fh = b[pos + 6] | (b[pos + 7] << 8)
                fpacked = b[pos + 8]
                pos += 9
                if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
                    return None
                ct = gct
                if fpacked & 0x80:
                    n = 2 << (fpacked & 7)
                    if pos + 3 * n > len(b):
                        return None
                    ct = b[pos : pos + 3 * n]
                    pos += 3 * n
                if ct is None:
                    return None
                if pos >= len(b):
                    return None
                min_code = b[pos]
                pos += 1
                data, pos = sub_blocks(pos)
                idx = _lzw(min_code, data, fw * fh)
                n_colors = len(ct) // 3
                if any(i >= n_colors for i in idx):
                    return None
                if fpacked & 0x40:  # 4-pass interlace: reorder rows
                    rows = [idx[r * fw : (r + 1) * fw] for r in range(fh)]
                    ordered: list[bytes | None] = [None] * fh
                    src = 0
                    for start, step in _INTERLACE:
                        for r in range(start, fh, step):
                            ordered[r] = rows[src]
                            src += 1
                    idx = b"".join(ordered)  # type: ignore[arg-type]
                before = bytes(canvas) if disposal == 3 else None
                for r in range(fh):
                    crow = (fy + r) * w
                    for c in range(fw):
                        px = idx[r * fw + c]
                        if px == transparent:
                            continue
                        o = 3 * (crow + fx + c)
                        canvas[o : o + 3] = ct[3 * px : 3 * px + 3]
                frames.append((delay_ms, bytes(canvas)))
                if disposal == 2 and gct is not None and (
                    3 * bg_index + 3 <= len(gct)
                ):
                    bg = gct[3 * bg_index : 3 * bg_index + 3]
                    for r in range(fh):
                        crow = (fy + r) * w
                        for c in range(fw):
                            o = 3 * (crow + fx + c)
                            canvas[o : o + 3] = bg
                elif disposal == 3 and before is not None:
                    canvas = bytearray(before)
                disposal = 0
                transparent = None
                delay_ms = 0
        except ValueError:
            return None

    return parse


def _make_avi_parser():
    """Pure-Python RIFF/AVI container parser for Motion-JPEG video — the
    video analog of the WAV parser, completing the image/audio/video triad
    of really-decoded modalities (the per-frame payloads feed the from-spec
    baseline JPEG decoder). Returns ``parse(b) -> (width, height,
    us_per_frame, [frame_bytes, ...])``, ``None`` for payloads that are not
    a structurally-valid AVI (RIFF sizes must be consistent, ``hdrl`` with
    ``avih`` + a ``vids`` stream and ``movi`` must all be present — digest
    fallback), and raises ``NotImplementedError`` for valid AVIs whose
    video stream uses any codec other than MJPG (those genuinely need
    codec libs — same honesty contract as non-PCM WAV)."""
    import struct as _struct

    def _walk(b: bytes, pos: int, end: int):
        """Yield (fourcc, body_start, body_len, list_type|None)."""
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            (sz,) = _struct.unpack_from("<I", b, pos + 4)
            body = pos + 8
            if body + sz > end:
                raise ValueError
            if cid in (b"RIFF", b"LIST"):
                if sz < 4:
                    raise ValueError
                yield cid, body + 4, sz - 4, b[body : body + 4]
            else:
                yield cid, body, sz, None
            pos = body + sz + (sz & 1)  # chunks pad to even offsets

    def parse(b: bytes):
        if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
            return None
        (riff_size,) = _struct.unpack_from("<I", b, 4)
        if riff_size + 8 != len(b):
            return None
        try:
            avih = None
            vids_compression = None
            frames: list[bytes] = []
            for cid, start, ln, ltype in _walk(b, 12, len(b)):
                if cid == b"LIST" and ltype == b"hdrl":
                    for c2, s2, l2, t2 in _walk(b, start, start + ln):
                        if c2 == b"avih":
                            if l2 < 40:
                                return None
                            avih = _struct.unpack_from("<10I", b, s2)
                        elif c2 == b"LIST" and t2 == b"strl":
                            is_vids = False
                            for c3, s3, l3, _t3 in _walk(b, s2, s2 + l2):
                                if c3 == b"strh" and l3 >= 8:
                                    is_vids = b[s3 : s3 + 4] == b"vids"
                                elif c3 == b"strf" and is_vids and l3 >= 20:
                                    # BITMAPINFOHEADER.biCompression
                                    vids_compression = b[s3 + 16 : s3 + 20]
                elif cid == b"LIST" and ltype == b"movi":
                    for c2, s2, l2, _t2 in _walk(b, start, start + ln):
                        # ##dc = compressed video frame of stream ##
                        if c2[2:4] == b"dc":
                            frames.append(b[s2 : s2 + l2])
        except ValueError:
            return None
        if avih is None or vids_compression is None or not frames:
            return None
        us_per_frame, _, _, _, total_frames = avih[:5]
        width, height = avih[8], avih[9]
        if us_per_frame == 0 or not (0 < width <= 1 << 15) or not (
            0 < height <= 1 << 15
        ):
            return None
        if total_frames != len(frames):
            return None
        if vids_compression != b"MJPG":
            raise NotImplementedError(
                "AVI video codecs other than Motion-JPEG require "
                "PIL/opencv/ffmpeg, not available in this env"
            )
        return width, height, us_per_frame, frames

    return parse


def _make_feature_fns(feature_dim: int):
    """Single source for the pixel-feature and digest-fallback math shared
    by ``extract_features`` and ``extract_frame_features`` — the two must
    stay bit-identical for cross-engine hash stability. A factory (not
    module-level functions) so every consumer closure stays
    by-value-picklable into self-contained executor tasks."""
    import hashlib as _hashlib

    def pixel_feature(w, h, rgb):
        n_px = w * h
        lums = [rgb[i] + rgb[i + 1] + rgb[i + 2] for i in range(0, 3 * n_px, 3)]
        return [
            float(w),
            float(h),
            round(sum(rgb[0::3]) / n_px, 6),
            round(sum(rgb[1::3]) / n_px, 6),
            round(sum(rgb[2::3]) / n_px, 6),
            round(min(lums) / 3.0, 6),
            round(max(lums) / 3.0, 6),
            round(sum(lums) / (3.0 * n_px), 6),
        ][:feature_dim]

    def digest_vec(b):
        d = _hashlib.sha256(b).digest()
        return [d[i] / 255.0 for i in range(feature_dim)]

    return pixel_feature, digest_vec


def _make_decode_stub(feature_dim: int):
    """Build the decode closure OUTSIDE module scope: the returned function
    has a non-resolvable qualname, so cloudpickle serializes it by VALUE
    into the mapInPandas task. Executors therefore never need the wsspark
    package on their PYTHONPATH — the task is self-contained, which is how
    a UDF should ship to a 1000-executor cluster."""
    parse = _make_pixel_parser()
    parse_wav = _make_wav_parser()
    pixel_feature, digest_vec = _make_feature_fns(feature_dim)

    def decode(payload):
        """Decode + feature extract. BMP/PPM, the complete PNG spec
        (all color types, 1-16-bit, straight/Adam7), baseline Huffman
        JPEG (grayscale or YCbCr, any sampling, DRI/RSTn), and GIF
        (first composited frame) are REALLY decoded: the 8-dim feature
        is (width, height, mean R/G/B, min/max/mean luminance) computed
        from actual pixels; 16-bit PCM WAV payloads likewise decode to
        (channels, rate, frames, duration_ms, rms, peak, mean,
        zero-crossing rate). 6dp-rounded for cross-engine hash
        stability. Lossless/arithmetic/12-bit JPEG and non-PCM,
        non-IMA-ADPCM audio raise (those genuinely need codec libs —
        explicit boundary).
        Anything else digests to a deterministic sha256 fake so opaque
        testdata still flows."""
        if payload is None:
            return None
        b = bytes(payload)
        wav = parse_wav(b)
        if wav is not None:
            n_ch, rate, samples = wav
            n_frames = len(samples) // n_ch
            mono = samples[::n_ch]  # first channel for the zcr
            zc = sum(
                1
                for i in range(1, len(mono))
                if (mono[i - 1] < 0) != (mono[i] < 0)
            )
            scale = 32768.0
            return [
                float(n_ch),
                float(rate),
                float(n_frames),
                round(1000.0 * n_frames / rate, 6),
                round(
                    (sum(s * s for s in samples) / max(1, len(samples))) ** 0.5
                    / scale,
                    6,
                ),
                round(max(abs(s) for s in samples) / scale, 6)
                if samples
                else 0.0,
                round(sum(samples) / max(1, len(samples)) / scale, 6),
                round(zc / max(1, len(mono) - 1), 6),
            ][:feature_dim]
        img = parse(b)
        if img is not None:
            w, h, rgb = img
            return pixel_feature(w, h, rgb)
        return digest_vec(b)

    return decode


decode_image_stub = _make_decode_stub(FEATURE_DIM)


def extract_features(media: DataFrame) -> DataFrame:
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


FRAME_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("frame_index", LongType(), False),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def extract_frame_features(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL frame sampling over video rows: Motion-JPEG AVI payloads are
    container-parsed (``_make_avi_parser``), the frame at each sampled
    timestamp is picked by the stream's own clock (``us_per_frame``), and
    ONLY those frames run the baseline JPEG decoder — a 1 fps sample of a
    30 fps stream decodes 1/30th of the frames, which is the point of
    sampling at 100 TB. Animated GIFs decode too (LZW + compositing, with
    each frame's own delay driving the timeline). Opaque payloads emit
    metadata-driven timestamps with deterministic digest features (the
    ``sample_frames`` plumbing contract); non-MJPG AVI codecs raise. One
    output row per sampled frame."""
    decode = _make_decode_stub(FEATURE_DIM)
    parse_avi = _make_avi_parser()
    parse_gif = _make_gif_parser()
    pixel_feature, digest_vec = _make_feature_fns(FEATURE_DIM)

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def rows_for(media_id, payload, duration_ms):
            if payload is None:
                return
            b = bytes(payload)
            if b[:6] in (b"GIF87a", b"GIF89a"):
                gif = parse_gif(b)
                if gif is not None:
                    w, h, frames = gif
                    # frame k covers [start_k, start_k + delay_k); sample
                    # every_ms against that timeline (0-delay frames get
                    # the GIF default of one tick so they stay sampleable)
                    starts, t = [], 0
                    for delay_ms, _rgb in frames:
                        starts.append(t)
                        t += max(delay_ms, 10)
                    for ts in range(0, max(t, 1), every_ms):
                        idx = max(i for i, s in enumerate(starts) if s <= ts)
                        yield media_id, ts, idx, pixel_feature(
                            w, h, frames[idx][1]
                        )
                    return
            avi = parse_avi(b)
            if avi is None:
                # opaque payload: metadata-driven timestamps, digest
                # features. duration_ms is NULLABLE: Arrow->pandas renders
                # a nullable long column with nulls as float64 NaN, which
                # passes an `is not None` check — compare NaN != NaN too.
                dur = (
                    0
                    if duration_ms is None or duration_ms != duration_ms
                    else int(duration_ms)
                )
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    yield media_id, ts, i, digest_vec(b + str(ts).encode())
                return
            _w, _h, us_per_frame, frames = avi
            dur_ms = len(frames) * us_per_frame // 1000
            for ts in range(0, max(dur_ms, 1), every_ms):
                idx = min(ts * 1000 // us_per_frame, len(frames) - 1)
                yield media_id, ts, idx, decode(frames[idx])

        for pdf in batches:
            out = {"media_id": [], "frame_ts_ms": [], "frame_index": [], "feature": []}
            for media_id, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                for mid, ts, idx, feat in rows_for(media_id, payload, dur):
                    out["media_id"].append(mid)
                    out["frame_ts_ms"].append(ts)
                    out["frame_index"].append(idx)
                    out["feature"].append(feat)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", "payload", "duration_ms")
        .mapInPandas(_frames, FRAME_FEATURE_SCHEMA)
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
    """Resize over image rows, Arrow-batched. Every decodable payload
    (BMP, PPM, full PNG, sequential + progressive JPEG, GIF first frame)
    is REALLY resized — nearest-neighbor sampling over the decoded pixel
    grid, re-encoded as binary P6 PPM. Only the genuinely codec-lib-bound
    profiles raise (lossless/arithmetic/12-bit JPEG); opaque payloads get
    the deterministic tag+bytes stub so the dataflow stays testable
    end-to-end on synthetic data."""

    parse = _make_pixel_parser()

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"RESIZED[{target_w}x{target_h}]".encode()
        header = f"P6\n{target_w} {target_h}\n255\n".encode()

        def one(payload):
            if payload is None:
                return None
            b = bytes(payload)
            img = parse(b)
            if img is None:
                return tag + b
            w, h, rgb = img
            out = bytearray(header)
            for y in range(target_h):
                sy = y * h // target_h
                for x in range(target_w):
                    i = 3 * (sy * w + x * w // target_w)
                    out += rgb[i : i + 3]
            return bytes(out)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "resized": pdf["payload"].map(one),
                }
            )

    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "payload")
        .mapInPandas(_resize, RESIZED_SCHEMA)
    )


SPECTRAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", LongType(), True),
        StructField("centroid_hz", DoubleType(), True),
        StructField("bandwidth_hz", DoubleType(), True),
        StructField("rolloff85_hz", DoubleType(), True),
        StructField("flatness", DoubleType(), True),
        StructField("rms", DoubleType(), True),
    ]
)


def _make_spectral_fn(n_fft: int, hop: int):
    """Framed short-time spectral analysis over decoded WAV audio — real
    DSP (Hann window + rFFT via numpy, vectorized over all frames at
    once), not a stub. Shipped by value like the other decoders so
    executors need no wsspark install."""
    parse_wav = _make_wav_parser()

    def spectral(payload):
        import numpy as np

        if payload is None:
            return None
        wav = parse_wav(bytes(payload))
        if wav is None:
            return None
        n_ch, rate, samples = wav
        mono = np.asarray(samples[::n_ch], dtype=np.float64) / 32768.0
        if mono.size < n_fft:
            mono = np.pad(mono, (0, n_fft - mono.size))
        n_frames = 1 + (mono.size - n_fft) // hop
        idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
        frames = mono[idx] * np.hanning(n_fft)[None, :]
        power = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (n_frames, n_bins)
        freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
        tot = power.sum(axis=1)
        live = tot > 0  # silent frames carry no spectral moments
        if not live.any():
            return (int(n_frames), 0.0, 0.0, 0.0, 0.0, 0.0)
        p, t = power[live], tot[live]
        centroid = (p * freqs).sum(axis=1) / t
        bandwidth = np.sqrt(
            (p * (freqs[None, :] - centroid[:, None]) ** 2).sum(axis=1) / t
        )
        cum = np.cumsum(p, axis=1)
        roll_bin = np.argmax(cum >= 0.85 * t[:, None], axis=1)
        rolloff = freqs[roll_bin]
        # spectral flatness: geometric / arithmetic mean of the power
        # spectrum (1 = white noise, -> 0 for pure tones)
        eps = 1e-12
        flat = np.exp(np.mean(np.log(p + eps), axis=1)) / (
            np.mean(p, axis=1) + eps
        )
        rms = float(np.sqrt(np.mean(mono**2)))
        return (
            int(n_frames),
            round(float(centroid.mean()), 6),
            round(float(bandwidth.mean()), 6),
            round(float(rolloff.mean()), 6),
            round(float(flat.mean()), 6),
            round(rms, 6),
        )

    return spectral


def audio_spectral_features(
    media: DataFrame, n_fft: int = 256, hop: int = 128
) -> DataFrame:
    """Short-time spectral features per audio payload: frame count, mean
    spectral centroid/bandwidth/85%-rolloff (Hz), mean spectral flatness,
    and signal RMS. The per-payload cost is O(samples * log n_fft) and
    fully partition-local (mapInPandas, Arrow batches) — the same scale
    shape as extract_features; at 100 TB repartition upstream by media_id
    so a few long recordings cannot skew batches. Non-audio / undecodable
    payloads yield NULL feature columns (kept, so corpus accounting stays
    exact)."""
    spectral = _make_spectral_fn(n_fft, hop)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(spectral)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": feats.map(lambda t: t[0] if t else None),
                    "centroid_hz": feats.map(lambda t: t[1] if t else None),
                    "bandwidth_hz": feats.map(lambda t: t[2] if t else None),
                    "rolloff85_hz": feats.map(lambda t: t[3] if t else None),
                    "flatness": feats.map(lambda t: t[4] if t else None),
                    "rms": feats.map(lambda t: t[5] if t else None),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _run, SPECTRAL_SCHEMA
    )
