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
