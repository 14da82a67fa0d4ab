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
