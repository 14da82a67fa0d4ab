"""PNG / WAV codec tests — structural spec conformance + round trips
(all five PNG scanline filters, all three color types)."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from arcon_spark.functions.codecs import png_decode, png_encode, wav_encode, wav_parse


def _pix(n: int) -> bytes:
    return bytes((i * 37 + (i >> 3)) & 0xFF for i in range(n))


def test_png_structure_is_spec_conformant():
    png = png_encode(_pix(4 * 3 * 2), 4, 2)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR: length 13, at offset 8
    assert struct.unpack_from(">I", png, 8)[0] == 13
    assert png[12:16] == b"IHDR"
    w, h, depth, color = struct.unpack_from(">IIBB", png, 16)
    assert (w, h, depth, color) == (4, 2, 8, 2)
    # IHDR CRC is the spec CRC32 of tag+body
    crc = struct.unpack_from(">I", png, 16 + 13)[0]
    assert crc == zlib.crc32(png[12 : 16 + 13]) & 0xFFFFFFFF
    assert png.endswith(b"IEND" + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF))


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (6, 4)])
def test_png_roundtrip_every_filter_and_colortype(ft, color_type, ch):
    w, h = 7, 5
    pixels = _pix(w * h * ch)
    out = png_decode(png_encode(pixels, w, h, color_type=color_type, filter_type=ft))
    assert out["width"] == w and out["height"] == h
    assert out["channels"] == ch
    assert out["pixels"] == pixels


def test_png_crc_corruption_detected():
    png = bytearray(png_encode(_pix(3 * 3), 3, 1, color_type=2))
    png[20] ^= 0xFF  # flip a byte inside IHDR body
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(png))


def test_png_rejects_non_png():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"GIF89a" + b"\x00" * 20)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    ft=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=255),
)
def test_png_roundtrip_property(w, h, ft, seed):
    pixels = bytes((i * seed + i // 7) & 0xFF for i in range(w * h * 3))
    out = png_decode(png_encode(pixels, w, h, color_type=2, filter_type=ft))
    assert out["pixels"] == pixels


def test_wav_roundtrip_and_header_fields():
    pcm = _pix(2000)
    wav = wav_encode(pcm, sample_rate=8000, channels=2, bits=16)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    parsed = wav_parse(wav)
    assert parsed["sample_rate"] == 8000
    assert parsed["channels"] == 2
    assert parsed["bits"] == 16
    assert parsed["n_samples"] == 2000 // 4  # block align = 4
    assert parsed["pcm"] == pcm


def test_wav_odd_data_chunk_word_alignment():
    # odd-length data chunk must be padded in the container but parse
    # back at its declared length
    pcm = b"\x01\x02\x03"
    parsed = wav_parse(wav_encode(pcm, channels=1, bits=8))
    assert parsed["pcm"] == pcm


def test_wav_skips_unknown_chunks():
    pcm = b"\x10\x20\x30\x40"
    wav = bytearray(wav_encode(pcm))
    # splice a LIST chunk between fmt and data
    fmt_end = wav.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    wav2 = bytes(wav[:fmt_end]) + extra + bytes(wav[fmt_end:])
    parsed = wav_parse(wav2)
    assert parsed["pcm"] == pcm


def test_wav_rejects_non_pcm():
    wav = bytearray(wav_encode(b"\x00\x00"))
    fmt_off = wav.index(b"fmt ") + 8
    struct.pack_into("<H", wav, fmt_off, 3)  # IEEE float format code
    with pytest.raises(ValueError, match="PCM"):
        wav_parse(bytes(wav))


# ---------------------------------------------------------------- H.264 I_PCM


def test_h264_emulation_prevention_exact():
    """7.4.1.1: zero runs get a 0x03 break wherever 00 00 would be
    followed by 00..03; stripping inverts exactly, including the
    pathological all-zeros run where insertions cascade."""
    from arcon_spark.functions.codecs import _ep_insert, _ep_strip

    assert _ep_insert(b"\x00\x00\x00") == b"\x00\x00\x03\x00"
    assert _ep_insert(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
    assert _ep_insert(b"\x00\x00\x03") == b"\x00\x00\x03\x03"
    assert _ep_insert(b"\x00\x00\x04") == b"\x00\x00\x04"  # no trigger
    five = b"\x00" * 5 + b"\xff"
    ins = _ep_insert(five)
    assert ins == b"\x00\x00\x03\x00\x00\x03\x00\xff"
    assert b"\x00\x00\x00" not in ins and b"\x00\x00\x01" not in ins
    assert _ep_strip(ins) == five
    import os
    for _ in range(50):
        blob = bytes(b % 5 for b in os.urandom(200))  # zero-heavy
        out = _ep_insert(blob)
        for bad in (b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02"):
            assert bad not in out
        assert _ep_strip(out) == blob


def test_h264_golden_structure():
    """Annex-B framing: 4-byte start codes, SPS(7)/PPS(8)/IDR(5) NAL
    types in order, baseline profile_idc 66 as the first SPS byte."""
    from arcon_spark.functions.codecs import h264_encode_ipcm

    s = h264_encode_ipcm([bytes(256)], 16, 16)
    assert s.startswith(b"\x00\x00\x00\x01")
    nal_types = []
    i = 0
    while True:
        j = s.find(b"\x00\x00\x00\x01", i)
        if j == -1:
            break
        nal_types.append(s[j + 4] & 0x1F)
        i = j + 4
    assert nal_types == [7, 8, 5]
    sps_at = s.find(b"\x00\x00\x00\x01") + 5
    assert s[sps_at] == 66  # profile_idc baseline


def test_h264_ipcm_roundtrip_multiframe_multimb():
    import os

    from arcon_spark.functions.codecs import h264_decode_ipcm, h264_encode_ipcm

    frames = [os.urandom(48 * 32) for _ in range(4)] + [b"\x00" * (48 * 32)]
    dec = h264_decode_ipcm(h264_encode_ipcm(frames, 48, 32))
    assert (dec["width"], dec["height"]) == (48, 32)
    assert dec["frames"] == frames


def test_h264_rejects_out_of_subset_streams():
    import pytest

    from arcon_spark.functions.codecs import h264_decode_ipcm, h264_encode_ipcm

    with pytest.raises(ValueError, match="multiples of 16"):
        h264_encode_ipcm([b""], 20, 16)
    with pytest.raises(ValueError, match="no NAL"):
        h264_decode_ipcm(b"\xde\xad\xbe\xef")
    s = bytearray(h264_encode_ipcm([bytes(256)], 16, 16))
    # flip the slice's mb_type ue(25) prefix into a tiny value -> not I_PCM
    idr = s.find(b"\x00\x00\x00\x01\x65")
    # slice header for this stream is fixed-width; corrupt a byte in the
    # mb_type region and expect a typed error, not silence
    s[idr + 8] ^= 0xFF
    with pytest.raises(ValueError):
        h264_decode_ipcm(bytes(s))


def test_h264_truncated_stream_raises():
    import pytest

    from arcon_spark.functions.codecs import h264_decode_ipcm, h264_encode_ipcm

    stream = h264_encode_ipcm([bytes(range(256)) * 2], 32, 16)
    # cut mid-I_PCM payload: the reader must raise, never return a
    # wrong-size frame
    with pytest.raises(ValueError, match="truncated"):
        h264_decode_ipcm(stream[: len(stream) - 40])


# ------------------------------------------------------------------ JPEG
# r10: the production encoder/decoder hot paths were vectorized
# (batched DCT + nonzero-only entropy loop; peek-16 huffman LUT over
# destuffed segments + batched IDCT). These tests pin the rewrite to
# the original bit-serial per-block formulation, kept here as the
# readable spec reference.

import numpy as _np

from arcon_spark.functions.codecs import (
    _ZIGZAG,
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    _BitReader,
    _BitWriter,
    _canonical_codes,
    _category,
    _decode_table,
    _extend,
    _fdct,
    _idct,
    _read_symbol,
    jpeg_decode,
    jpeg_encode_gray,
)


def _ref_encode_entropy(padded, qmat, dc_codes, ac_codes):
    """The original per-block encoder loop (reference for byte-equality
    with the batched implementation)."""
    bh = padded.shape[0] // 8
    bw = padded.shape[1] // 8
    w = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = _np.round((_fdct(block)) / qmat).astype(_np.int64)
            zz = [int(coef.flat[_ZIGZAG[i]]) for i in range(64)]
            diff = zz[0] - pred
            pred = zz[0]
            t = _category(diff)
            code, ln = dc_codes[t]
            w.write(code, ln)
            if t:
                w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            for k in range(1, 64):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    w.write(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = ac_codes[(run << 4) | s]
                w.write(code, ln)
                w.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                code, ln = ac_codes[0x00]
                w.write(code, ln)
    w.flush()
    return bytes(w.out)


def _ref_jpeg_entropy_bytes(pixels: bytes, width: int, height: int) -> bytes:
    img = _np.frombuffer(pixels, dtype=_np.uint8).reshape(height, width)
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    padded = _np.pad(
        img.astype(_np.float64) - 128.0,
        ((0, bh * 8 - height), (0, bw * 8 - width)),
        mode="edge",
    )
    q = [8] * 64
    qmat = _np.array(q, dtype=_np.float64)[_np.argsort(_ZIGZAG)].reshape(8, 8)
    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    return _ref_encode_entropy(padded, qmat, dc_codes, ac_codes)


def _ref_decode_scan(data, pos, scan, comps, quant, width, height, restart_interval):
    """The original bit-serial scan decoder (per-block IDCT)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        c["plane"] = _np.zeros((bh * 8, bw * 8), dtype=_np.float64)
        c["qmat"] = _np.array(quant[c["tq"]], dtype=_np.float64)[
            _np.argsort(_ZIGZAG)
        ].reshape(8, 8)
        c["pred"] = 0
    br = _BitReader(data, pos)
    zz_unsort = _np.argsort(_ZIGZAG)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                m = br.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError(f"expected RST marker, got 0x{m:02x}")
                br = _BitReader(data, br.pos)
                for c in comps:
                    c["pred"] = 0
            for comp, dtab, atab in scan:
                for v in range(comp["v"]):
                    for h in range(comp["h"]):
                        zz = _np.zeros(64, dtype=_np.float64)
                        t = _read_symbol(br, dtab)
                        diff = _extend(br.receive(t), t)
                        comp["pred"] += diff
                        zz[0] = comp["pred"]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, atab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        coef = (zz * comp["qmat"].reshape(-1)[_ZIGZAG])[
                            zz_unsort
                        ].reshape(8, 8)
                        blk = _np.clip(_np.round(_idct(coef)) + 128.0, 0, 255)
                        by = (my * comp["v"] + v) * 8
                        bx = (mx * comp["h"] + h) * 8
                        comp["plane"][by : by + 8, bx : bx + 8] = blk
            n_mcu += 1
    p = br.pos
    while data[p] != 0xFF or data[p + 1] == 0x00 or 0xD0 <= data[p + 1] <= 0xD7:
        p += 1
    return p


def _ref_jpeg_decode(data: bytes) -> dict:
    """Original decoder: header walk + bit-serial scan (grayscale and
    YCbCr, sampling factors 1-2, DRI/RSTn, 0xFF00 stuffing)."""
    import struct as _struct

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        (seglen,) = _struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    tbl = [
                        _struct.unpack_from(">H", seg, p + 2 * i)[0]
                        for i in range(64)
                    ]
                    p += 128
                else:
                    tbl = list(seg[p : p + 64])
                    p += 64
                quant[tq] = tbl
        elif marker in (0xC0, 0xC1):
            _prec, height, width, ncomp = _struct.unpack_from(">BHHB", seg, 0)
            comps = []
            p = 6
            for _ in range(ncomp):
                cid, hv, tq = seg[p], seg[p + 1], seg[p + 2]
                p += 3
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:
            (restart_interval,) = _struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, huff_dc[tdta >> 4], huff_ac[tdta & 15]))
            pos = _ref_decode_scan(
                data, pos + seglen, scan, comps, quant, width, height,
                restart_interval,
            )
            continue
        pos += seglen

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(comps) == 1:
        plane = comps[0]["plane"][:height, :width]
        return {
            "width": width, "height": height, "n_components": 1,
            "pixels": bytes(plane.astype(_np.uint8).tobytes()),
        }
    planes = []
    for c in comps:
        p = c["plane"]
        p = _np.repeat(_np.repeat(p, hmax // c["h"], axis=1), vmax // c["v"], axis=0)
        planes.append(p[:height, :width].astype(_np.float64))
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = _np.stack(
        [_np.clip(_np.round(x), 0, 255).astype(_np.uint8) for x in (r, g, b)],
        axis=-1,
    )
    return {
        "width": width, "height": height, "n_components": 3,
        "pixels": rgb.tobytes(),
    }


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_jpeg_batched_encoder_bytes_equal_blockwise_reference(w, h, seed):
    rng = _np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=w * h, dtype=_np.uint8).tobytes()
    got = jpeg_encode_gray(pixels, w, h)
    # entropy-coded section must be byte-identical to the per-block
    # reference (headers are deterministic constants around it)
    ref_scan = _ref_jpeg_entropy_bytes(pixels, w, h)
    sos = got.find(b"\xff\xda")
    body = got[sos + 2 + 8 : -2]  # SOS header is 8 payload bytes + EOI
    assert body == ref_scan


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_jpeg_fast_decoder_matches_bitserial_reference(w, h, seed):
    rng = _np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=w * h, dtype=_np.uint8).tobytes()
    jpg = jpeg_encode_gray(pixels, w, h)
    got = jpeg_decode(jpg)
    ref = _ref_jpeg_decode(jpg)
    assert got["width"] == ref["width"] and got["height"] == ref["height"]
    assert got["pixels"] == ref["pixels"]


def test_jpeg_constant_block_roundtrip_exact():
    # the registered query's invariant: one byte per constant 8x8 block
    # with the flat-8 quantizer is exactly invertible
    data = bytes(range(256))
    vals = _np.frombuffer(data, dtype=_np.uint8)
    img = _np.repeat(_np.repeat(vals.reshape(16, 16), 8, axis=0), 8, axis=1)
    jpg = jpeg_encode_gray(img.tobytes(), 128, 128)
    dec = jpeg_decode(jpg)
    out = _np.frombuffer(dec["pixels"], dtype=_np.uint8).reshape(128, 128)
    assert bytes(out[::8, ::8].reshape(-1).tobytes()) == data


def _build_color_420_jpeg(y_dcs, cb_dc, cr_dc, mcux, mcuy, restart_interval=0):
    """Hand-assemble a 3-component 4:2:0 baseline stream of constant
    blocks (DC-only), optionally with DRI/RSTn framing — exercises the
    decoder branches the grayscale encoder cannot produce."""
    import struct as _struct

    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    q = [8] * 64

    def body_segments():
        segs = []
        w = _BitWriter()
        pred = {0: 0, 1: 0, 2: 0}
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n and n % restart_interval == 0:
                    w.flush()
                    segs.append(bytes(w.out))
                    w = _BitWriter()
                    pred = {0: 0, 1: 0, 2: 0}
                for ci, dcs in (
                    (0, [y_dcs[(2 * my) % len(y_dcs)], y_dcs[(2 * my + mx) % len(y_dcs)],
                         y_dcs[(2 * my + 1) % len(y_dcs)], y_dcs[(2 * my + mx + 1) % len(y_dcs)]]),
                    (1, [cb_dc]),
                    (2, [cr_dc]),
                ):
                    for dcval in dcs:
                        diff = dcval - pred[ci]
                        pred[ci] = dcval
                        t = _category(diff)
                        code, ln = dc_codes[t]
                        w.write(code, ln)
                        if t:
                            w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                        code, ln = ac_codes[0x00]  # EOB
                        w.write(code, ln)
                n += 1
        w.flush()
        segs.append(bytes(w.out))
        return segs

    def stuff(b: bytes) -> bytes:
        return b.replace(b"\xff", b"\xff\x00")

    width = mcux * 16
    height = mcuy * 16
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + _struct.pack(">H", 67) + b"\x00" + bytes(q)
    out += b"\xff\xc0" + _struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes([1, 0x22, 0])  # Y: h=v=2
    out += bytes([2, 0x11, 0])  # Cb
    out += bytes([3, 0x11, 0])  # Cr
    for tc_th, bits, vals in (
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ):
        out += b"\xff\xc4" + _struct.pack(">H", 3 + 16 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + _struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + _struct.pack(">H", 12) + bytes(
        [3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]
    )
    segs = body_segments()
    for i, seg in enumerate(segs):
        out += stuff(seg)
        if i < len(segs) - 1:
            out += bytes([0xFF, 0xD0 + (i % 8)])
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("restart_interval", [0, 1, 3])
def test_jpeg_color_420_with_restarts_matches_reference(restart_interval):
    jpg = _build_color_420_jpeg(
        y_dcs=[-12, 3, 7, -1], cb_dc=4, cr_dc=-9, mcux=3, mcuy=2,
        restart_interval=restart_interval,
    )
    got = jpeg_decode(jpg)
    ref = _ref_jpeg_decode(jpg)
    assert got["n_components"] == 3 and ref["n_components"] == 3
    assert (got["width"], got["height"]) == (48, 32)
    assert got["pixels"] == ref["pixels"]
