"""Real media codecs in pure Python — PNG and WAV(PCM), stdlib only.

The container has no PIL/libvips/ffmpeg, so round 1 stubbed the codec
call behind a deterministic fake (multimodal.py). These are NOT stubs:
a from-scratch implementation of two PUBLIC formats —

- PNG (RFC 2083 / W3C PNG spec): 8-byte signature, chunked layout with
  CRC32, IHDR geometry, zlib-deflated IDAT, scanline filters 0-4
  (None/Sub/Up/Average/Paeth) for 8-bit greyscale / RGB / RGBA.
  stdlib `zlib` supplies DEFLATE and CRC32; everything else (chunk
  framing, filter reconstruction, Paeth predictor) is implemented from
  the spec. Any standard viewer opens our output; any standard
  encoder's output (8-bit, non-interlaced) decodes here.
- WAV (RIFF/WAVE, PCM): RIFF header, fmt chunk (rate / channels /
  bits), data chunk walk. `struct` handles the little-endian fields.

Role in the engine: the executor-side decode stage for multimodal
binary columns (reference model: opaque proto `bytes` payloads,
arcon_tests/src/proto_derive_test.rs `Advanced.bytes`). The Spark
plumbing in functions/multimodal.py feeds these through Arrow-batched
mapInPandas; at 100 TB swap in libvips/ffmpeg bindings behind the same
function signatures for JPEG/H.264 — the formats there are codec
libraries' business, but the partitioning/batching stays identical.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["png_encode", "png_decode", "wav_encode", "wav_parse"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples per pixel


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(
    pixels: bytes,
    width: int,
    height: int,
    color_type: int = 2,
    filter_type: int = 0,
) -> bytes:
    """Encode raw 8-bit pixel bytes (len == width*height*channels) as a
    spec-conformant PNG. `filter_type` applies one filter to every
    scanline (0..4) — used by tests to prove the decoder inverts each
    of the five spec filters."""
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError(f"pixels: want {stride * height} bytes, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        raw += _filter_line(filter_type, line, prev, ch)
        prev = line
    idat = zlib.compress(bytes(raw), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_line(ft: int, line: bytes, prev: bytes, ch: int) -> bytes:
    if ft == 0:
        return line
    out = bytearray(len(line))
    for i, x in enumerate(line):
        a = line[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        if ft == 1:
            out[i] = (x - a) & 0xFF
        elif ft == 2:
            out[i] = (x - b) & 0xFF
        elif ft == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ft == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter {ft}")
    return bytes(out)


def png_decode(data: bytes) -> dict:
    """Decode an 8-bit non-interlaced PNG (greyscale/RGB/RGBA, filters
    0-4). Returns {width, height, color_type, channels, pixels}."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width is None:
        raise ValueError("missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG variant (depth={bit_depth}, color={color_type},"
            f" interlace={interlace})"
        )
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT length does not match geometry")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        rec = bytearray(stride)
        for i, x in enumerate(line):
            a = rec[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                rec[i] = x
            elif ft == 1:
                rec[i] = (x + a) & 0xFF
            elif ft == 2:
                rec[i] = (x + b) & 0xFF
            elif ft == 3:
                rec[i] = (x + (a + b) // 2) & 0xFF
            elif ft == 4:
                rec[i] = (x + _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"bad filter byte {ft}")
        out[y * stride : (y + 1) * stride] = rec
        prev = bytes(rec)
    return {
        "width": width,
        "height": height,
        "color_type": color_type,
        "channels": ch,
        "pixels": bytes(out),
    }


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------


def wav_encode(pcm: bytes, sample_rate: int = 16000, channels: int = 1, bits: int = 16) -> bytes:
    """Wrap raw little-endian PCM bytes in a RIFF/WAVE container."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits)
    body = b"WAVE" + _riff_chunk(b"fmt ", fmt) + _riff_chunk(b"data", pcm)
    return _riff_chunk(b"RIFF", body)


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def wav_parse(data: bytes) -> dict:
    """Parse a RIFF/WAVE PCM file → {sample_rate, channels, bits,
    n_samples, pcm}. Walks chunks, so extra chunks (LIST, cue) are
    skipped correctly."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            pcm = body
        pos += 8 + ln + (ln % 2)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"not PCM (format {audio_format})")
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
        "n_samples": len(pcm) // block_align,
        "pcm": pcm,
    }


# ===========================================================================
# JPEG baseline (ITU-T T.81, public spec) — sequential DCT, huffman
# entropy coding. Decoder handles general baseline streams (grayscale
# or YCbCr, h/v sampling factors 1-2 incl. 4:2:0, restart markers,
# byte stuffing); encoder emits grayscale JFIF with the spec's Annex K
# example huffman tables. numpy supplies the 8x8 (I)DCT as two matrix
# multiplies against the precomputed cosine basis.
# ===========================================================================

import numpy as _np

__all__ += ["jpeg_encode_gray", "jpeg_decode"]

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 example huffman tables (BITS = count of codes per length
# 1..16, then the symbol values in code order)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical per T.81 Annex C."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-serial decoder."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


# 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = _np.array(
    [
        [
            (0.353553390593273762 if u == 0 else 0.5)
            * _np.cos((2 * x + 1) * u * _np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _fdct(block: "_np.ndarray") -> "_np.ndarray":
    return _A @ block @ _A.T


def _idct(coef: "_np.ndarray") -> "_np.ndarray":
    return _A.T @ coef @ _A


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1s per spec


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    de-stuffing; stops at (and exposes) RST/other markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt  # RSTn / EOI etc.
                self._acc = (self._acc << 8) | 0  # pad past marker
                self._n += 8
                return
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Consume up to the pending marker (after an MCU row ends at a
        restart boundary); returns the marker byte."""
        self._acc = 0
        self._n = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
        m = self.data[self.pos + 1]
        self.pos += 2
        self.marker = None
        return m


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension: v is t bits; top bit 0 => negative."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


_DEFAULT_QUANT = [8] * 64  # flat table: constant blocks round-trip exactly


def jpeg_encode_gray(
    pixels: bytes, width: int, height: int, quant: list[int] | None = None
) -> bytes:
    """Baseline sequential JFIF, one grayscale component, Annex K
    huffman tables. `pixels` is row-major 8-bit, len = width*height."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match geometry")
    q = list(quant or _DEFAULT_QUANT)
    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)

    img = _np.frombuffer(pixels, dtype=_np.uint8).reshape(height, width)
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    # edge blocks replicate the last row/column (the standard encoder
    # choice — keeps edge DC meaningful)
    padded = _np.pad(
        img.astype(_np.float64) - 128.0,
        ((0, bh * 8 - height), (0, bw * 8 - width)),
        mode="edge",
    )
    qmat = _np.array(q, dtype=_np.float64)[_np.argsort(_ZIGZAG)].reshape(8, 8)

    w = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = _np.round(_fdct(block) / qmat).astype(_np.int64)
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
                    code, ln = ac_codes[0xF0]  # ZRL
                    w.write(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = ac_codes[(run << 4) | s]
                w.write(code, ln)
                w.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                code, ln = ac_codes[0x00]  # EOB
                w.write(code, ln)
    w.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(q)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes([1, 0x11, 0])  # component 1, h=v=1, quant table 0
    for tc_th, bits, vals in (
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_decode(data: bytes) -> dict:
    """Baseline JPEG → {"width", "height", "n_components", "pixels"}.
    pixels is row-major bytes: grayscale (1 comp) or interleaved RGB
    (3 comps, BT.601 YCbCr conversion). Supports sampling factors 1-2
    per axis (4:4:4, 4:2:2, 4:2:0), DRI/RSTn, and 0xFF00 stuffing."""
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
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    tbl = [struct.unpack_from(">H", seg, p + 2 * i)[0] for i in range(64)]
                    p += 128
                else:
                    tbl = list(seg[p : p + 64])
                    p += 64
                quant[tq] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline / ext sequential)
            _prec, height, width, ncomp = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            p = 6
            for _ in range(ncomp):
                cid, hv, tq = seg[p], seg[p + 1], seg[p + 2]
                p += 3
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG mode (SOF marker 0x{marker:02x})")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, huff_dc[tdta >> 4], huff_ac[tdta & 15]))
            pos = _decode_scan(
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
    if len(comps) != 3:
        raise ValueError(f"unsupported component count {len(comps)}")
    planes = []
    for c in comps:
        p = c["plane"]
        # nearest-neighbor upsample to full resolution, per the spec's
        # suggested simple reconstruction
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


def _decode_scan(
    data: bytes, pos: int, scan, comps, quant, width: int, height: int,
    restart_interval: int,
) -> int:
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
                                break  # EOB
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
    # skip to the next marker (EOI or another segment)
    p = br.pos
    while data[p] != 0xFF or data[p + 1] == 0x00 or 0xD0 <= data[p + 1] <= 0xD7:
        p += 1
    return p


def _read_symbol(br: "_BitReader", table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy stream")
