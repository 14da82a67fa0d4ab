"""Protobuf wire-format primitives (public encoding spec).

Implements https://protobuf.dev/programming-guides/encoding/ —
base-128 varints (two's-complement 64-bit for negative ints), ZigZag,
fixed32/64, and tag packing.  Original code; shares its design with
arcon_spark.proto (the repo's standalone wire codec) but is kept
dependency-free so Spark python workers can import it without
arcon_spark on their path.
"""

from __future__ import annotations

import struct

WIRETYPE_VARINT = 0
WIRETYPE_FIXED64 = 1
WIRETYPE_LENGTH_DELIMITED = 2
WIRETYPE_START_GROUP = 3
WIRETYPE_END_GROUP = 4
WIRETYPE_FIXED32 = 5

_U64_MASK = (1 << 64) - 1
_U32_MASK = (1 << 32) - 1


def write_varint(buf: bytearray, value: int) -> None:
    """Append an unsigned base-128 varint. Negative ints are cast to
    their 64-bit two's-complement (10-byte) form per the spec."""
    value &= _U64_MASK
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            buf.append(byte | 0x80)
        else:
            buf.append(byte)
            return


def read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        byte = data[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result & _U64_MASK, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def zigzag_encode(value: int) -> int:
    return ((value << 1) ^ (value >> 63)) & _U64_MASK


def zigzag_decode(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


def zigzag_encode32(value: int) -> int:
    return ((value << 1) ^ (value >> 31)) & _U32_MASK if value < 0 else value << 1


def to_signed32(value: int) -> int:
    value &= _U32_MASK
    return value - (1 << 32) if value >= (1 << 31) else value


def to_signed64(value: int) -> int:
    value &= _U64_MASK
    return value - (1 << 64) if value >= (1 << 63) else value


def make_tag(field_number: int, wire_type: int) -> int:
    return (field_number << 3) | wire_type


def split_tag(tag: int) -> tuple[int, int]:
    return tag >> 3, tag & 0x7


def write_fixed32(buf: bytearray, value: int) -> None:
    buf.extend(struct.pack("<I", value & _U32_MASK))


def write_fixed64(buf: bytearray, value: int) -> None:
    buf.extend(struct.pack("<Q", value & _U64_MASK))


def write_float(buf: bytearray, value: float) -> None:
    buf.extend(struct.pack("<f", value))


def write_double(buf: bytearray, value: float) -> None:
    buf.extend(struct.pack("<d", value))


def skip_field(data: bytes, pos: int, wire_type: int) -> int:
    """Advance past an unknown field's payload."""
    if wire_type == WIRETYPE_VARINT:
        _, pos = read_varint(data, pos)
        return pos
    if wire_type == WIRETYPE_FIXED64:
        return pos + 8
    if wire_type == WIRETYPE_LENGTH_DELIMITED:
        length, pos = read_varint(data, pos)
        return pos + length
    if wire_type == WIRETYPE_FIXED32:
        return pos + 4
    raise ValueError(f"cannot skip wire type {wire_type}")
