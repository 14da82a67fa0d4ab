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
