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


def _fdct_blocks(blocks: "_np.ndarray") -> "_np.ndarray":
    """Batched 8x8 DCT-II over an (n, 8, 8) stack — the same two basis
    matmuls as _fdct, broadcast over the block axis (one BLAS dispatch
    per image instead of two per block). Byte-equality with the
    per-block form is pinned by tests/test_codecs.py."""
    return _A @ blocks @ _A.T


def _idct_blocks(coefs: "_np.ndarray") -> "_np.ndarray":
    """Batched inverse of _fdct_blocks."""
    return _A.T @ coefs @ _A


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


_FAST_TABLE_CACHE: dict = {}


def _fast_table(bits: list[int], vals: list[int]) -> tuple[list[int], list[int]]:
    """(sym_lut, len_lut): 65536-entry peek-16 huffman decode tables
    (python lists — list indexing is the per-symbol hot path). A code
    of length L owns the 2^(16-L) windows sharing its prefix; windows
    no code owns read length 0 (invalid prefix — the bit-serial
    reader's "no code matched in 16 bits" error). Cached per table
    CONTENT: a corpus of Annex-K-table JPEGs builds the tables once
    per process, not once per image."""
    key = (bytes(bits), bytes(vals))
    hit = _FAST_TABLE_CACHE.get(key)
    if hit is None:
        sym = _np.zeros(1 << 16, dtype=_np.int32)
        ln = _np.zeros(1 << 16, dtype=_np.int32)
        for s, (code, length) in _canonical_codes(bits, vals).items():
            lo = code << (16 - length)
            sym[lo : lo + (1 << (16 - length))] = s
            ln[lo : lo + (1 << (16 - length))] = length
        hit = (sym.tolist(), ln.tolist())
        _FAST_TABLE_CACHE[key] = hit
    return hit


class _FastBits:
    """MSB-first reader over a DESTUFFED entropy segment: peek-16
    huffman decode and multi-bit receive as int.from_bytes window
    reads — replaces ~30 per-bit python calls per block with 2-4
    window reads. Reading past the end yields zero bits, the same
    padding semantics as the bit-serial reader crossing a marker
    (equivalence vs _BitReader pinned by tests/test_codecs.py)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes) -> None:
        self.data = data + b"\x00\x00\x00\x00\x00"
        self.bitpos = 0

    def read_huff(self, sym_lut: list[int], len_lut: list[int]) -> int:
        bp = self.bitpos
        i = bp >> 3
        v = (int.from_bytes(self.data[i : i + 4], "big") >> (16 - (bp & 7))) & 0xFFFF
        length = len_lut[v]
        if length == 0:
            raise ValueError("invalid huffman code in entropy stream")
        self.bitpos = bp + length
        return sym_lut[v]

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        bp = self.bitpos
        self.bitpos = bp + n
        i = bp >> 3
        return (int.from_bytes(self.data[i : i + 5], "big") >> (40 - n - (bp & 7))) & (
            (1 << n) - 1
        )


def _entropy_segment(data: bytes, pos: int) -> tuple[bytes, int, int]:
    """Destuffed entropy bytes from `pos` to the next marker: returns
    (destuffed, marker_byte, marker_pos) where data[marker_pos] is the
    0xFF. 0xFF00 inside the segment is a stuffed data byte; any other
    0xFF pair ends it (RSTn / EOI / next header)."""
    i = pos
    n = len(data)
    while True:
        j = data.find(b"\xff", i)
        if j == -1 or j + 1 >= n:
            raise ValueError("truncated JPEG stream (no marker after scan data)")
        nxt = data[j + 1]
        if nxt == 0x00:
            i = j + 2
            continue
        return data[pos:j].replace(b"\xff\x00", b"\xff"), nxt, j


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

    # r10: one batched DCT/quantize/zigzag pass over every block (the
    # per-block two-matmul form paid ~2 numpy dispatches plus a
    # 64-element python list comprehension per block), then an entropy
    # loop that touches only the NONZERO coefficients — for flat-quant
    # constant blocks that is 3 huffman writes per block instead of a
    # 64-iteration scan. Byte-identical to the per-block reference
    # (tests/test_codecs.py pins the equality).
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
    )
    coef = _np.round(_fdct_blocks(blocks) / qmat).astype(_np.int64)
    zz = coef.reshape(-1, 64)[:, _ZIGZAG]
    dc = zz[:, 0]
    diffs_l = (dc - _np.concatenate(([0], dc[:-1]))).tolist()
    nzr, nzc = _np.nonzero(zz[:, 1:])
    nzc_l = (nzc + 1).tolist()
    nzv_l = zz[nzr, nzc + 1].tolist()
    bounds = _np.searchsorted(nzr, _np.arange(len(zz) + 1)).tolist()

    w = _BitWriter()
    zrl_c, zrl_n = ac_codes[0xF0]  # ZRL
    eob_c, eob_n = ac_codes[0x00]  # EOB
    for i in range(len(zz)):
        diff = diffs_l[i]
        t = _category(diff)
        code, ln = dc_codes[t]
        w.write(code, ln)
        if t:
            w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        prev = 0
        for p in range(bounds[i], bounds[i + 1]):
            k = nzc_l[p]
            v = nzv_l[p]
            run = k - prev - 1
            while run > 15:
                w.write(zrl_c, zrl_n)
                run -= 16
            s = _category(v)
            code, ln = ac_codes[(run << 4) | s]
            w.write(code, ln)
            w.write(v if v >= 0 else v + (1 << s) - 1, s)
            prev = k
        if prev != 63:
            w.write(eob_c, eob_n)
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
                # stored as (bits, vals): the scan builds (and caches)
                # the peek-16 LUTs from the raw table definition
                (huff_ac if tc else huff_dc)[th] = (bits, vals)
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
    """r10 rewrite of the scan decoder — same spec-shaped MCU walk
    (interleaved components, sampling factors, RSTn restarts), with
    the two hot paths vectorized: huffman symbols read via the peek-16
    LUT over pre-destuffed segments (_FastBits) instead of per-bit
    python calls, and dequantize/IDCT/clip deferred and run BATCHED
    per component after the entropy pass (one numpy dispatch per
    component instead of three per block). Pixel-equality with the
    bit-serial per-block reference is pinned by tests/test_codecs.py
    (grayscale, 4:2:0 color, and restart-marker streams)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        nblk = bw * bh
        c["bw"], c["bh"] = bw, bh
        # coefficients accumulate in ZIGZAG order, so the dequantize
        # multiplier in zigzag order is the raw DQT list itself
        c["qvec"] = _np.array(quant[c["tq"]], dtype=_np.float64)
        c["zzmat"] = _np.zeros((nblk, 64), dtype=_np.float64)
        c["blkpos"] = _np.zeros((nblk, 2), dtype=_np.int64)
        c["nblk"] = 0
        c["pred"] = 0

    fscan = [
        (comp, _fast_table(*dtab), _fast_table(*atab))
        for comp, dtab, atab in scan
    ]
    seg, marker, mpos = _entropy_segment(data, pos)
    br = _FastBits(seg)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                if not (0xD0 <= marker <= 0xD7):
                    raise ValueError(f"expected RST marker, got 0x{marker:02x}")
                seg, marker, mpos = _entropy_segment(data, mpos + 2)
                br = _FastBits(seg)
                for c in comps:
                    c["pred"] = 0
            for comp, (dsym, dlen), (asym, alen) in fscan:
                for v in range(comp["v"]):
                    for h in range(comp["h"]):
                        zzm = comp["zzmat"]
                        bi = comp["nblk"]
                        t = br.read_huff(dsym, dlen)
                        diff = _extend(br.receive(t), t)
                        comp["pred"] += diff
                        zzm[bi, 0] = comp["pred"]
                        k = 1
                        while k < 64:
                            rs = br.read_huff(asym, alen)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            zzm[bi, k] = _extend(br.receive(s), s)
                            k += 1
                        comp["blkpos"][bi, 0] = my * comp["v"] + v
                        comp["blkpos"][bi, 1] = mx * comp["h"] + h
                        comp["nblk"] = bi + 1
            n_mcu += 1

    # batched dequantize + IDCT + round/clip + scatter, per component
    zz_unsort = _np.argsort(_ZIGZAG)
    for c in comps:
        n = c["nblk"]
        plane = _np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=_np.float64)
        if n:
            deq = c["zzmat"][:n] * c["qvec"][None, :]
            coefs = deq[:, zz_unsort].reshape(n, 8, 8)
            blks = _np.clip(_np.round(_idct_blocks(coefs)) + 128.0, 0, 255)
            pv = plane.reshape(c["bh"], 8, c["bw"], 8)
            pv[c["blkpos"][:n, 0], :, c["blkpos"][:n, 1], :] = blks
        c["plane"] = plane
        del c["zzmat"], c["blkpos"], c["qvec"]

    # skip to the next marker (EOI or another segment), ignoring RSTs
    p = mpos
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


# ---------------------------------------------------------------------------
# H.264 / AVC baseline, I_PCM-only subset (ITU-T Rec. H.264 / ISO 14496-10)
#
# A REAL Annex-B bitstream, from the public spec: start-code framing,
# emulation-prevention three-byte insertion/removal (7.3.1/7.4.1.1),
# Exp-Golomb ue(v)/se(v) coding (9.1), baseline SPS/PPS syntax
# (7.3.2.1/7.3.2.2), IDR slice headers (7.3.3), and macroblock_layer
# with mb_type = I_PCM (7.3.5: pcm_alignment_zero_bit + raw
# pcm_sample_luma/chroma). I_PCM carries samples uncompressed, so the
# stream is exactly invertible — the same trick as the constant-block
# JPEG above: a conformant-subset bitstream whose entropy/framing
# machinery all executes for real, decodable by any AVC decoder.
# The reference carries video bytes only as opaque Vec<u8>
# (proto_derive_test.rs Advanced.bytes); this closes the last codec
# stub (decode_image_stub's video half) with a genuine format.
# ---------------------------------------------------------------------------

_NAL_SPS = 7
_NAL_PPS = 8
_NAL_IDR = 5


def _ep_insert(rbsp: bytes) -> bytes:
    """RBSP → NAL payload: insert emulation_prevention_three_byte so
    no 0x000000..0x000003 sequence survives (7.4.1.1). The inserted
    0x03 breaks the zero run, so scanning resumes at the byte that
    triggered the insertion (it may begin a new pair)."""
    out = bytearray()
    i, n = 0, len(rbsp)
    while True:
        j = rbsp.find(b"\x00\x00", i)
        if j == -1 or j + 2 >= n:
            out += rbsp[i:]
            return bytes(out)
        if rbsp[j + 2] <= 3:
            out += rbsp[i : j + 2]
            out.append(3)
            i = j + 2
        else:
            out += rbsp[i : j + 3]
            i = j + 3


def _ep_strip(nal: bytes) -> bytes:
    """NAL payload → RBSP: drop the 0x03 of every 0x000003 run."""
    out = bytearray()
    i = 0
    while True:
        j = nal.find(b"\x00\x00\x03", i)
        if j == -1:
            out += nal[i:]
            return bytes(out)
        out += nal[i : j + 2]
        i = j + 3


class _H264BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def u(self, v: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def ue(self, v: int) -> None:
        k = v + 1
        n = k.bit_length() - 1
        self.u(0, n)
        self.u(k, n + 1)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self) -> None:
        while self.nbits:
            self.u(0, 1)

    def raw(self, data: bytes) -> None:
        assert self.nbits == 0, "raw bytes must be byte-aligned"
        self.buf += data

    def trailing(self) -> bytes:
        self.u(1, 1)  # rbsp_stop_one_bit
        self.align_zero()
        return bytes(self.buf)


class _H264BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise ValueError("truncated H.264 stream")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("malformed exp-golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def align(self) -> None:
        while self.pos & 7:
            if self.u(1) != 0:
                raise ValueError("nonzero pcm_alignment_zero_bit")

    def raw(self, n: int) -> bytes:
        assert self.pos & 7 == 0
        start = self.pos >> 3
        if start + n > len(self.data):
            raise ValueError("truncated I_PCM stream")
        self.pos += 8 * n
        return self.data[start : start + n]


def _nal(nal_type: int, rbsp: bytes, ref_idc: int = 3) -> bytes:
    return b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | nal_type]) + _ep_insert(rbsp)


def h264_encode_ipcm(frames: list, width: int, height: int) -> bytes:
    """Encode luma frames (each `width*height` bytes, raster order) as
    a baseline Annex-B stream of IDR pictures made entirely of I_PCM
    macroblocks (chroma planes fixed mid-gray 0x80, 4:2:0). Dimensions
    must be multiples of 16."""
    if width % 16 or height % 16:
        raise ValueError("H.264 dimensions must be multiples of 16")
    w_mbs, h_mbs = width // 16, height // 16

    sps = _H264BitWriter()
    sps.u(66, 8)  # profile_idc: baseline
    sps.u(0, 8)  # constraint flags + reserved_zero_2bits
    sps.u(30, 8)  # level_idc 3.0
    sps.ue(0)  # seq_parameter_set_id
    sps.ue(0)  # log2_max_frame_num_minus4 -> MaxFrameNum 16
    sps.ue(2)  # pic_order_cnt_type 2 (no further POC syntax)
    sps.ue(0)  # max_num_ref_frames
    sps.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    sps.ue(w_mbs - 1)  # pic_width_in_mbs_minus1
    sps.ue(h_mbs - 1)  # pic_height_in_map_units_minus1
    sps.u(1, 1)  # frame_mbs_only_flag
    sps.u(1, 1)  # direct_8x8_inference_flag
    sps.u(0, 1)  # frame_cropping_flag
    sps.u(0, 1)  # vui_parameters_present_flag
    out = bytearray(_nal(_NAL_SPS, sps.trailing()))

    pps = _H264BitWriter()
    pps.ue(0)  # pic_parameter_set_id
    pps.ue(0)  # seq_parameter_set_id
    pps.u(0, 1)  # entropy_coding_mode_flag: CAVLC
    pps.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    pps.ue(0)  # num_slice_groups_minus1
    pps.ue(0)  # num_ref_idx_l0_default_active_minus1
    pps.ue(0)  # num_ref_idx_l1_default_active_minus1
    pps.u(0, 1)  # weighted_pred_flag
    pps.u(0, 2)  # weighted_bipred_idc
    pps.se(0)  # pic_init_qp_minus26
    pps.se(0)  # pic_init_qs_minus26
    pps.se(0)  # chroma_qp_index_offset
    pps.u(0, 1)  # deblocking_filter_control_present_flag
    pps.u(0, 1)  # constrained_intra_pred_flag
    pps.u(0, 1)  # redundant_pic_cnt_present_flag
    out += _nal(_NAL_PPS, pps.trailing())

    chroma = b"\x80" * 64  # one 8x8 plane per component, mid-gray
    for idx, luma in enumerate(frames):
        if len(luma) != width * height:
            raise ValueError("frame size must be width*height luma bytes")
        sl = _H264BitWriter()
        sl.ue(0)  # first_mb_in_slice
        sl.ue(7)  # slice_type: I (all slices in picture)
        sl.ue(0)  # pic_parameter_set_id
        sl.u(0, 4)  # frame_num (log2_max_frame_num = 4)
        sl.ue(idx & 1)  # idr_pic_id (consecutive IDRs must alternate)
        # dec_ref_pic_marking (IDR, nal_ref_idc != 0):
        sl.u(0, 1)  # no_output_of_prior_pics_flag
        sl.u(0, 1)  # long_term_reference_flag
        sl.se(0)  # slice_qp_delta
        for mby in range(h_mbs):
            for mbx in range(w_mbs):
                sl.ue(25)  # mb_type: I_PCM
                sl.align_zero()  # pcm_alignment_zero_bit*
                rows = [
                    luma[
                        (mby * 16 + r) * width
                        + mbx * 16 : (mby * 16 + r) * width
                        + mbx * 16
                        + 16
                    ]
                    for r in range(16)
                ]
                sl.raw(b"".join(rows))  # pcm_sample_luma
                sl.raw(chroma)  # pcm_sample_chroma Cb
                sl.raw(chroma)  # pcm_sample_chroma Cr
        out += _nal(_NAL_IDR, sl.trailing())
    return bytes(out)


def h264_decode_ipcm(data: bytes) -> dict:
    """Decode an Annex-B baseline stream whose pictures are all-I_PCM
    IDR frames (the subset h264_encode_ipcm emits): returns
    {"width", "height", "frames": [luma bytes per picture]}. Validates
    start codes, strips emulation prevention, and parses SPS/PPS/slice
    syntax for real — a stream with inter macroblocks or residual
    coding raises rather than guessing."""
    # split on start codes (3- or 4-byte, per B.1.1)
    nals = []
    i = 0
    n = len(data)
    while i < n:
        j = data.find(b"\x00\x00\x01", i)
        if j == -1:
            break
        start = j + 3
        k = data.find(b"\x00\x00\x01", start)
        end = k if k != -1 else n
        # trailing zero bytes are start-code prefix / trailing_zero_8bits
        # padding, never payload: rbsp_trailing_bits ends every RBSP on
        # a nonzero byte
        while end > start and data[end - 1] == 0:
            end -= 1
        nals.append(data[start:end])
        i = end if k != -1 else n
    if not nals:
        raise ValueError("no NAL units found")

    width = height = None
    w_mbs = h_mbs = 0
    frames = []
    for nal in nals:
        if not nal:
            continue
        if nal[0] & 0x80:
            raise ValueError("forbidden_zero_bit set")
        nal_type = nal[0] & 0x1F
        br = _H264BitReader(_ep_strip(nal[1:]))
        if nal_type == _NAL_SPS:
            profile = br.u(8)
            br.u(8)  # constraint flags
            br.u(8)  # level_idc
            br.ue()  # seq_parameter_set_id
            if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
                raise ValueError("high-profile SPS not supported in I_PCM subset")
            log2_mfn = br.ue() + 4
            poc_type = br.ue()
            if poc_type == 0:
                br.ue()
            elif poc_type == 1:
                raise ValueError("pic_order_cnt_type 1 not supported")
            br.ue()  # max_num_ref_frames
            br.u(1)
            w_mbs = br.ue() + 1
            h_mbs = br.ue() + 1
            if br.u(1) != 1:
                raise ValueError("interlaced (frame_mbs_only_flag=0) unsupported")
            width, height = w_mbs * 16, h_mbs * 16
            log2_mfn_active = log2_mfn
        elif nal_type == _NAL_PPS:
            br.ue()
            br.ue()
            if br.u(1) != 0:
                raise ValueError("CABAC streams not supported in I_PCM subset")
        elif nal_type == _NAL_IDR:
            if width is None:
                raise ValueError("slice before SPS")
            if br.ue() != 0:
                raise ValueError("multi-slice pictures not supported")
            st = br.ue()
            if st % 5 != 2:  # 2/7 = I slice
                raise ValueError("non-I slice in I_PCM subset")
            br.ue()  # pic_parameter_set_id
            br.u(log2_mfn_active)  # frame_num
            br.ue()  # idr_pic_id
            br.u(1)  # no_output_of_prior_pics_flag
            br.u(1)  # long_term_reference_flag
            br.se()  # slice_qp_delta
            luma = bytearray(width * height)
            for mb in range(w_mbs * h_mbs):
                mb_type = br.ue()
                if mb_type != 25:
                    raise ValueError(
                        f"mb_type {mb_type}: only I_PCM (25) decodable here"
                    )
                br.align()
                mbx, mby = mb % w_mbs, mb // w_mbs
                block = br.raw(256)
                for r in range(16):
                    off = (mby * 16 + r) * width + mbx * 16
                    luma[off : off + 16] = block[r * 16 : (r + 1) * 16]
                br.raw(128)  # chroma, discarded (fixed mid-gray)
            frames.append(bytes(luma))
    if width is None:
        raise ValueError("stream has no SPS")
    return {"width": width, "height": height, "frames": frames}
