"""Concrete message classes for the vendored protobuf shim.

``build_message_class(descriptor)`` manufactures a Python class whose
instances implement the slice of the public Message API that generated
code and PySpark's state clients use: kwarg construction, scalar
attribute get/set with proto3 presence + oneof bookkeeping,
``SerializeToString`` (canonical field-number order, packed repeated
numerics), ``ParseFromString`` (packed + unpacked, unknown fields
skipped, concatenated sub-messages merged), ``HasField`` /
``WhichOneof`` / ``CopyFrom`` / ``Clear``.

Wire behavior follows the public encoding spec; conformance is pinned
by golden vectors in tests/test_protoshim.py and end-to-end against
Spark's JVM state server (real Java protobuf) in tests/test_tws.py.
"""

from __future__ import annotations

import struct

from .. import descriptor as _d
from ..message import DecodeError, Message
from . import wire_format as w

_F = _d.FieldDescriptor

_VARINT_TYPES = {
    _F.TYPE_INT32,
    _F.TYPE_INT64,
    _F.TYPE_UINT32,
    _F.TYPE_UINT64,
    _F.TYPE_BOOL,
    _F.TYPE_ENUM,
    _F.TYPE_SINT32,
    _F.TYPE_SINT64,
}
_FIXED64_TYPES = {_F.TYPE_FIXED64, _F.TYPE_SFIXED64, _F.TYPE_DOUBLE}
_FIXED32_TYPES = {_F.TYPE_FIXED32, _F.TYPE_SFIXED32, _F.TYPE_FLOAT}
_NUMERIC_TYPES = _VARINT_TYPES | _FIXED64_TYPES | _FIXED32_TYPES


def _wire_type_of(ftype: int) -> int:
    if ftype in _VARINT_TYPES:
        return w.WIRETYPE_VARINT
    if ftype in _FIXED64_TYPES:
        return w.WIRETYPE_FIXED64
    if ftype in _FIXED32_TYPES:
        return w.WIRETYPE_FIXED32
    return w.WIRETYPE_LENGTH_DELIMITED


def _scalar_default(fd: _d.FieldDescriptor):
    if fd.type == _F.TYPE_STRING:
        return ""
    if fd.type == _F.TYPE_BYTES:
        return b""
    if fd.type == _F.TYPE_BOOL:
        return False
    if fd.type in (_F.TYPE_DOUBLE, _F.TYPE_FLOAT):
        return 0.0
    return 0


def _coerce(fd: _d.FieldDescriptor, value):
    """Light type validation/coercion on assignment."""
    t = fd.type
    if t == _F.TYPE_STRING:
        if not isinstance(value, str):
            raise TypeError(f"{fd.name} expects str, got {type(value).__name__}")
        return value
    if t == _F.TYPE_BYTES:
        if isinstance(value, (bytearray, memoryview)):
            return bytes(value)
        if not isinstance(value, bytes):
            raise TypeError(f"{fd.name} expects bytes, got {type(value).__name__}")
        return value
    if t == _F.TYPE_BOOL:
        return bool(value)
    if t in (_F.TYPE_DOUBLE, _F.TYPE_FLOAT):
        return float(value)
    return int(value)


def _encode_scalar(buf: bytearray, fd: _d.FieldDescriptor, value) -> None:
    """Payload bytes only (no tag)."""
    t = fd.type
    if t == _F.TYPE_SINT32:
        w.write_varint(buf, w.zigzag_encode32(value))
    elif t == _F.TYPE_SINT64:
        w.write_varint(buf, w.zigzag_encode(value))
    elif t in _VARINT_TYPES:
        w.write_varint(buf, int(value))
    elif t == _F.TYPE_DOUBLE:
        w.write_double(buf, value)
    elif t == _F.TYPE_FLOAT:
        w.write_float(buf, value)
    elif t in (_F.TYPE_FIXED64, _F.TYPE_SFIXED64):
        w.write_fixed64(buf, value)
    elif t in (_F.TYPE_FIXED32, _F.TYPE_SFIXED32):
        w.write_fixed32(buf, value)
    elif t in (_F.TYPE_STRING, _F.TYPE_BYTES):
        raw = value.encode("utf-8") if t == _F.TYPE_STRING else value
        w.write_varint(buf, len(raw))
        buf.extend(raw)
    else:  # pragma: no cover
        raise TypeError(f"cannot encode field type {t}")


def _decode_scalar(fd: _d.FieldDescriptor, data: bytes, pos: int, wire: int):
    t = fd.type
    if wire == w.WIRETYPE_VARINT:
        raw, pos = w.read_varint(data, pos)
        if t == _F.TYPE_SINT32 or t == _F.TYPE_SINT64:
            return w.zigzag_decode(raw), pos
        if t == _F.TYPE_BOOL:
            return bool(raw), pos
        if t in (_F.TYPE_INT32, _F.TYPE_ENUM):
            return w.to_signed32(raw) if raw < (1 << 32) else w.to_signed64(raw), pos
        if t == _F.TYPE_INT64:
            return w.to_signed64(raw), pos
        return raw, pos  # uint32 / uint64
    if wire == w.WIRETYPE_FIXED64:
        chunk = data[pos : pos + 8]
        pos += 8
        if t == _F.TYPE_DOUBLE:
            return struct.unpack("<d", chunk)[0], pos
        value = struct.unpack("<Q", chunk)[0]
        return (w.to_signed64(value) if t == _F.TYPE_SFIXED64 else value), pos
    if wire == w.WIRETYPE_FIXED32:
        chunk = data[pos : pos + 4]
        pos += 4
        if t == _F.TYPE_FLOAT:
            return struct.unpack("<f", chunk)[0], pos
        value = struct.unpack("<I", chunk)[0]
        return (w.to_signed32(value) if t == _F.TYPE_SFIXED32 else value), pos
    if wire == w.WIRETYPE_LENGTH_DELIMITED and t in (_F.TYPE_STRING, _F.TYPE_BYTES):
        length, pos = w.read_varint(data, pos)
        raw = data[pos : pos + length]
        pos += length
        return (raw.decode("utf-8") if t == _F.TYPE_STRING else raw), pos
    raise DecodeError(f"field {fd.name}: unexpected wire type {wire}")


class _ShimMessage(Message):
    DESCRIPTOR: _d.Descriptor = None  # type: ignore[assignment]

    def __init__(self, **kwargs) -> None:
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_oneof_case", {})
        for name, value in kwargs.items():
            if value is None:
                continue
            fd = self.DESCRIPTOR.fields_by_name.get(name)
            if fd is None:
                raise ValueError(f'Protocol message {self.DESCRIPTOR.name} has no "{name}" field.')
            if fd.is_map:
                entry = fd.message_type
                kf, vf = entry.fields_by_number[1], entry.fields_by_number[2]
                target: dict = {}
                for k, v in dict(value).items():
                    key = _coerce(kf, k)
                    if vf.type == _F.TYPE_MESSAGE:
                        target[key] = self._copy_sub(vf, v)
                    else:
                        target[key] = _coerce(vf, v)
                self._values[name] = target
            elif fd.is_repeated:
                if fd.type == _F.TYPE_MESSAGE:
                    self._values[name] = [self._copy_sub(fd, v) for v in value]
                else:
                    self._values[name] = [_coerce(fd, v) for v in value]
            elif fd.type == _F.TYPE_MESSAGE:
                self._set_field(fd, self._copy_sub(fd, value))
            else:
                self._set_field(fd, _coerce(fd, value))

    # -- field storage -------------------------------------------------
    def _copy_sub(self, fd: _d.FieldDescriptor, value: "_ShimMessage") -> "_ShimMessage":
        if not isinstance(value, _ShimMessage) or value.DESCRIPTOR is not fd.message_type:
            raise TypeError(
                f"{fd.name} expects {fd.message_type.full_name}, got {type(value).__name__}"
            )
        clone = build_message_class(fd.message_type)()
        clone.MergeFrom(value)
        return clone

    def _set_field(self, fd: _d.FieldDescriptor, value) -> None:
        oneof = fd.containing_oneof
        if oneof is not None:
            current = self._oneof_case.get(oneof.name)
            if current is not None and current != fd.name:
                self._values.pop(current, None)
            self._oneof_case[oneof.name] = fd.name
        self._values[fd.name] = value
        # write-through for default sub-message views: `msg.sub.x = 1`
        # must register `sub` on the parent (real-runtime semantics),
        # not silently mutate a throwaway — chains recursively so
        # `msg.a.b.x = 1` attaches the whole path
        parent_ref = self.__dict__.get("_parent_ref")
        if parent_ref is not None:
            parent, pfd = parent_ref
            object.__setattr__(self, "_parent_ref", None)
            if parent._values.get(pfd.name) is not self:
                parent._set_field(pfd, self)

    def __getattr__(self, name: str):
        # Only reached when normal lookup fails — all field reads land here.
        desc = type(self).DESCRIPTOR
        fd = desc.fields_by_name.get(name) if desc is not None else None
        if fd is None:
            raise AttributeError(name)
        values = self._values
        if name in values:
            return values[name]
        if fd.is_map:
            fresh_map: dict = {}
            values[name] = fresh_map  # auto-vivify so writes persist
            return fresh_map
        if fd.is_repeated:
            fresh: list = []
            values[name] = fresh  # auto-vivify so appends persist
            return fresh
        if fd.type == _F.TYPE_MESSAGE:
            # default view: reading sets no presence, but a write to any
            # of its fields attaches it to this parent (_set_field)
            sub = build_message_class(fd.message_type)()
            object.__setattr__(sub, "_parent_ref", (self, fd))
            return sub
        return _scalar_default(fd)

    def __setattr__(self, name: str, value) -> None:
        if name.startswith("_"):
            object.__setattr__(self, name, value)
            return
        fd = self.DESCRIPTOR.fields_by_name.get(name)
        if fd is None:
            raise AttributeError(
                f'Protocol message {self.DESCRIPTOR.name} has no "{name}" field.'
            )
        if fd.is_repeated or fd.type == _F.TYPE_MESSAGE:
            raise AttributeError(
                f"Assignment not allowed to composite field {name!r} (use merge/append)"
            )
        self._set_field(fd, _coerce(fd, value))

    # -- public API ----------------------------------------------------
    def HasField(self, name: str) -> bool:  # noqa: N802
        fd = self.DESCRIPTOR.fields_by_name.get(name)
        if fd is not None:
            if fd.is_repeated:
                raise ValueError(f"field {name} is repeated; HasField is ambiguous")
            return name in self._values
        if name in self.DESCRIPTOR.oneofs_by_name:
            return self._oneof_case.get(name) is not None
        raise ValueError(f"unknown field {name}")

    def WhichOneof(self, oneof_name: str):  # noqa: N802
        if oneof_name not in self.DESCRIPTOR.oneofs_by_name:
            raise ValueError(f"unknown oneof {oneof_name}")
        return self._oneof_case.get(oneof_name)

    def Clear(self) -> None:  # noqa: N802
        self._values.clear()
        self._oneof_case.clear()

    def ClearField(self, name: str) -> None:  # noqa: N802
        fd = self.DESCRIPTOR.fields_by_name.get(name)
        if fd is None:
            raise ValueError(f"unknown field {name}")
        self._values.pop(name, None)
        if fd.containing_oneof is not None:
            if self._oneof_case.get(fd.containing_oneof.name) == name:
                del self._oneof_case[fd.containing_oneof.name]

    def MergeFrom(self, other: "_ShimMessage") -> None:  # noqa: N802
        if other.DESCRIPTOR is not self.DESCRIPTOR:
            raise TypeError("MergeFrom requires same message type")
        for fd in self.DESCRIPTOR.fields:
            if fd.name not in other._values:
                continue
            value = other._values[fd.name]
            if fd.is_map:
                mine_map = self.__getattr__(fd.name)
                vf = fd.message_type.fields_by_number[2]
                for k, v in value.items():
                    mine_map[k] = (
                        self._copy_sub(vf, v) if vf.type == _F.TYPE_MESSAGE else v
                    )
            elif fd.is_repeated:
                mine = self.__getattr__(fd.name)
                if fd.type == _F.TYPE_MESSAGE:
                    mine.extend(self._copy_sub(fd, v) for v in value)
                else:
                    mine.extend(value)
            elif fd.type == _F.TYPE_MESSAGE:
                if fd.name in self._values:
                    self._values[fd.name].MergeFrom(value)
                else:
                    self._set_field(fd, self._copy_sub(fd, value))
            else:
                self._set_field(fd, value)

    def CopyFrom(self, other: "_ShimMessage") -> None:  # noqa: N802
        self.Clear()
        self.MergeFrom(other)

    def ListFields(self):  # noqa: N802
        out = []
        for fd in sorted(self.DESCRIPTOR.fields, key=lambda f: f.number):
            if fd.name in self._values:
                value = self._values[fd.name]
                if fd.is_repeated and not value:
                    continue
                out.append((fd, value))
        return out

    def SerializeToString(self) -> bytes:  # noqa: N802
        buf = bytearray()
        for fd in sorted(self.DESCRIPTOR.fields, key=lambda f: f.number):
            value = self._values.get(fd.name)
            if value is None:
                continue
            if fd.is_map:
                if not value:
                    continue
                entry = fd.message_type
                kf, vf = entry.fields_by_number[1], entry.fields_by_number[2]
                for k in sorted(value):  # deterministic entry order
                    body = bytearray()
                    v = value[k]
                    if k != _scalar_default(kf):  # entry fields: implicit presence
                        w.write_varint(body, w.make_tag(1, _wire_type_of(kf.type)))
                        _encode_scalar(body, kf, k)
                    if vf.type == _F.TYPE_MESSAGE:
                        sub = v.SerializeToString()
                        w.write_varint(body, w.make_tag(2, w.WIRETYPE_LENGTH_DELIMITED))
                        w.write_varint(body, len(sub))
                        body.extend(sub)
                    elif v != _scalar_default(vf):
                        w.write_varint(body, w.make_tag(2, _wire_type_of(vf.type)))
                        _encode_scalar(body, vf, v)
                    w.write_varint(buf, w.make_tag(fd.number, w.WIRETYPE_LENGTH_DELIMITED))
                    w.write_varint(buf, len(body))
                    buf.extend(body)
            elif fd.is_repeated:
                if not value:
                    continue
                if fd.type in _NUMERIC_TYPES:
                    # proto3 default: packed
                    payload = bytearray()
                    for v in value:
                        _encode_scalar(payload, fd, v)
                    w.write_varint(buf, w.make_tag(fd.number, w.WIRETYPE_LENGTH_DELIMITED))
                    w.write_varint(buf, len(payload))
                    buf.extend(payload)
                elif fd.type == _F.TYPE_MESSAGE:
                    for v in value:
                        body = v.SerializeToString()
                        w.write_varint(buf, w.make_tag(fd.number, w.WIRETYPE_LENGTH_DELIMITED))
                        w.write_varint(buf, len(body))
                        buf.extend(body)
                else:  # repeated string/bytes: one tag per element
                    for v in value:
                        w.write_varint(buf, w.make_tag(fd.number, w.WIRETYPE_LENGTH_DELIMITED))
                        _encode_scalar(buf, fd, v)
            elif fd.type == _F.TYPE_MESSAGE:
                body = value.SerializeToString()
                w.write_varint(buf, w.make_tag(fd.number, w.WIRETYPE_LENGTH_DELIMITED))
                w.write_varint(buf, len(body))
                buf.extend(body)
            else:
                # proto3 implicit presence: skip default values unless the
                # field carries explicit presence (oneof member / optional).
                if not fd.has_presence and value == _scalar_default(fd):
                    continue
                w.write_varint(buf, w.make_tag(fd.number, _wire_type_of(fd.type)))
                _encode_scalar(buf, fd, value)
        return bytes(buf)

    SerializePartialToString = SerializeToString

    def ParseFromString(self, data: bytes) -> int:  # noqa: N802
        self.Clear()
        self.MergeFromString(data)
        return len(data)

    def MergeFromString(self, data: bytes) -> int:  # noqa: N802
        if isinstance(data, (bytearray, memoryview)):
            data = bytes(data)
        pos = 0
        end = len(data)
        fields = self.DESCRIPTOR.fields_by_number
        try:
            while pos < end:
                tag, pos = w.read_varint(data, pos)
                number, wire = w.split_tag(tag)
                fd = fields.get(number)
                if fd is None:
                    pos = w.skip_field(data, pos, wire)
                    continue
                if fd.is_map:
                    target_map = self.__getattr__(fd.name)
                    entry = fd.message_type
                    kf, vf = entry.fields_by_number[1], entry.fields_by_number[2]
                    length, pos = w.read_varint(data, pos)
                    body = data[pos : pos + length]
                    pos += length
                    k = _scalar_default(kf)
                    v = (
                        build_message_class(vf.message_type)()
                        if vf.type == _F.TYPE_MESSAGE
                        else _scalar_default(vf)
                    )
                    bp = 0
                    while bp < len(body):
                        btag, bp = w.read_varint(body, bp)
                        bnum, bwire = w.split_tag(btag)
                        if bnum == 1:
                            k, bp = _decode_scalar(kf, body, bp, bwire)
                        elif bnum == 2 and vf.type == _F.TYPE_MESSAGE:
                            blen, bp = w.read_varint(body, bp)
                            v.MergeFromString(body[bp : bp + blen])
                            bp += blen
                        elif bnum == 2:
                            v, bp = _decode_scalar(vf, body, bp, bwire)
                        else:
                            bp = w.skip_field(body, bp, bwire)
                    target_map[k] = v
                elif fd.is_repeated:
                    target = self.__getattr__(fd.name)
                    if fd.type == _F.TYPE_MESSAGE:
                        length, pos = w.read_varint(data, pos)
                        sub = build_message_class(fd.message_type)()
                        sub.MergeFromString(data[pos : pos + length])
                        pos += length
                        target.append(sub)
                    elif (
                        fd.type in _NUMERIC_TYPES
                        and wire == w.WIRETYPE_LENGTH_DELIMITED
                    ):
                        # packed numerics
                        length, pos = w.read_varint(data, pos)
                        stop = pos + length
                        elem_wire = _wire_type_of(fd.type)
                        while pos < stop:
                            v, pos = _decode_scalar(fd, data, pos, elem_wire)
                            target.append(v)
                    else:
                        v, pos = _decode_scalar(fd, data, pos, wire)
                        target.append(v)
                elif fd.type == _F.TYPE_MESSAGE:
                    length, pos = w.read_varint(data, pos)
                    if fd.name in self._values:
                        self._values[fd.name].MergeFromString(data[pos : pos + length])
                    else:
                        sub = build_message_class(fd.message_type)()
                        sub.MergeFromString(data[pos : pos + length])
                        self._set_field(fd, sub)
                    pos += length
                else:
                    v, pos = _decode_scalar(fd, data, pos, wire)
                    self._set_field(fd, v)
        except (ValueError, struct.error, IndexError) as exc:
            raise DecodeError(str(exc)) from exc
        return pos

    def ByteSize(self) -> int:  # noqa: N802
        return len(self.SerializeToString())

    def IsInitialized(self) -> bool:  # noqa: N802
        return True  # proto3: no required fields

    def __eq__(self, other) -> bool:
        if not isinstance(other, _ShimMessage) or other.DESCRIPTOR is not self.DESCRIPTOR:
            return NotImplemented
        return self.ListFields() == other.ListFields()

    def __bool__(self) -> bool:
        return True

    def __repr__(self) -> str:
        parts = ", ".join(f"{fd.name}={value!r}" for fd, value in self.ListFields())
        return f"{self.DESCRIPTOR.name}({parts})"

    __str__ = __repr__


_class_cache: dict[int, type] = {}


def build_message_class(descriptor: _d.Descriptor) -> type:
    """Return (building if needed) the concrete class for a descriptor."""
    cached = _class_cache.get(id(descriptor))
    if cached is not None:
        return cached
    cls = type(descriptor.name, (_ShimMessage,), {"DESCRIPTOR": descriptor})
    _class_cache[id(descriptor)] = cls
    descriptor._concrete_class = cls
    return cls
