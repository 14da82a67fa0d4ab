"""DescriptorPool: parse serialized FileDescriptorProto bytes.

Generated ``*_pb2`` modules embed their schema as a serialized
``FileDescriptorProto`` (itself a protobuf message, schema published in
descriptor.proto).  This parser walks that wire data with small
field-number tables — only the pieces generated code needs: messages,
fields, oneofs, enums, nested types.  Everything else (options, source
code info, services, extensions) is skipped by wire type.
"""

from __future__ import annotations

from . import descriptor as _d
from .internal import wire_format as w

# field-number -> (attr, kind[, repeated]) tables for the descriptor.proto
# messages we materialize. kind: 'string' | 'varint' | sub-table dict.
_ENUM_VALUE_T = {1: ("name", "string"), 2: ("number", "varint")}
_ENUM_T = {1: ("name", "string"), 2: ("value", _ENUM_VALUE_T, True)}
_ONEOF_T = {1: ("name", "string")}
_FIELD_T = {
    1: ("name", "string"),
    3: ("number", "varint"),
    4: ("label", "varint"),
    5: ("type", "varint"),
    6: ("type_name", "string"),
    9: ("oneof_index", "varint"),
    10: ("json_name", "string"),
    17: ("proto3_optional", "varint"),
}
_MSG_OPTIONS_T = {7: ("map_entry", "varint")}
_MESSAGE_T: dict = {
    1: ("name", "string"),
    2: ("field", _FIELD_T, True),
    4: ("enum_type", _ENUM_T, True),
    7: ("options", _MSG_OPTIONS_T),
    8: ("oneof_decl", _ONEOF_T, True),
}
_MESSAGE_T[3] = ("nested_type", _MESSAGE_T, True)  # recursive
_FILE_T = {
    1: ("name", "string"),
    2: ("package", "string"),
    4: ("message_type", _MESSAGE_T, True),
    5: ("enum_type", _ENUM_T, True),
    12: ("syntax", "string"),
}


def _parse(table: dict, data: bytes) -> dict:
    """Generic table-driven parse of one descriptor.proto message."""
    out: dict = {}
    pos = 0
    while pos < len(data):
        tag, pos = w.read_varint(data, pos)
        number, wire = w.split_tag(tag)
        entry = table.get(number)
        if entry is None:
            pos = w.skip_field(data, pos, wire)
            continue
        attr, kind = entry[0], entry[1]
        repeated = len(entry) > 2 and entry[2]
        if kind == "varint":
            value, pos = w.read_varint(data, pos)
        else:
            length, pos = w.read_varint(data, pos)
            raw = data[pos : pos + length]
            pos += length
            value = raw.decode("utf-8") if kind == "string" else _parse(kind, raw)
        if repeated:
            out.setdefault(attr, []).append(value)
        else:
            out[attr] = value
    return out


def _build_enum(proto: dict, prefix: str) -> _d.EnumDescriptor:
    values = [
        _d.EnumValueDescriptor(v.get("name", ""), v.get("number", 0))
        for v in proto.get("value", [])
    ]
    name = proto.get("name", "")
    return _d.EnumDescriptor(name, f"{prefix}.{name}" if prefix else name, values)


def _build_message(proto: dict, prefix: str) -> _d.Descriptor:
    name = proto.get("name", "")
    full = f"{prefix}.{name}" if prefix else name
    oneofs = [_d.OneofDescriptor(o.get("name", "")) for o in proto.get("oneof_decl", [])]
    fields = []
    for fp in proto.get("field", []):
        fd = _d.FieldDescriptor(
            name=fp.get("name", ""),
            number=fp.get("number", 0),
            type=fp.get("type", 0),
            label=fp.get("label", _d.FieldDescriptor.LABEL_OPTIONAL),
            json_name=fp.get("json_name"),
            proto3_optional=bool(fp.get("proto3_optional", 0)),
            type_name=fp.get("type_name", ""),
        )
        if "oneof_index" in fp:
            oneof = oneofs[fp["oneof_index"]]
            fd.containing_oneof = oneof
            oneof.fields.append(fd)
        fields.append(fd)
    nested = [_build_message(m, full) for m in proto.get("nested_type", [])]
    enums = [_build_enum(e, full) for e in proto.get("enum_type", [])]
    desc = _d.Descriptor(name, full, fields, oneofs, nested, enums)
    # map<K,V> fields compile to repeated synthetic Entry messages with
    # options.map_entry = true (public descriptor.proto contract)
    desc._is_map_entry = bool(proto.get("options", {}).get("map_entry", 0))
    for f in fields:
        f.containing_type = desc
    for t in nested:
        t.containing_type = desc
    for e in enums:
        e.containing_type = desc
    return desc


class DescriptorPool:
    def __init__(self) -> None:
        self._files_by_name: dict[str, _d.FileDescriptor] = {}
        self._messages: dict[str, _d.Descriptor] = {}
        self._enums: dict[str, _d.EnumDescriptor] = {}

    def AddSerializedFile(self, serialized: bytes) -> _d.FileDescriptor:  # noqa: N802
        proto = _parse(_FILE_T, serialized)
        name = proto.get("name", "")
        if name in self._files_by_name:
            return self._files_by_name[name]
        package = proto.get("package", "")
        file_des = _d.FileDescriptor(name, package, serialized)
        for mp in proto.get("message_type", []):
            desc = _build_message(mp, package)
            desc.file = file_des
            file_des.message_types_by_name[desc.name] = desc
            self._register_message(desc, file_des)
        for ep in proto.get("enum_type", []):
            enum = _build_enum(ep, package)
            enum.file = file_des
            file_des.enum_types_by_name[enum.name] = enum
            self._enums[enum.full_name] = enum
        self._resolve_types()
        self._files_by_name[name] = file_des
        return file_des

    def _register_message(self, desc: _d.Descriptor, file_des: _d.FileDescriptor) -> None:
        self._messages[desc.full_name] = desc
        for e in desc.enum_types:
            self._enums[e.full_name] = e
        for t in desc.nested_types:
            t.file = file_des
            self._register_message(t, file_des)

    def _resolve_types(self) -> None:
        """Second pass: bind ``.pkg.Type`` references to descriptors."""
        for desc in self._messages.values():
            for f in desc.fields:
                if not f._type_name:
                    continue
                ref = f._type_name.lstrip(".")
                if f.type == _d.FieldDescriptor.TYPE_MESSAGE:
                    f.message_type = self._messages.get(ref)
                    if f.message_type is None:
                        raise KeyError(f"unresolved message type {f._type_name}")
                elif f.type == _d.FieldDescriptor.TYPE_ENUM:
                    f.enum_type = self._enums.get(ref)
                    if f.enum_type is None:
                        raise KeyError(f"unresolved enum type {f._type_name}")

    def FindMessageTypeByName(self, full_name: str) -> _d.Descriptor:  # noqa: N802
        return self._messages[full_name]

    def FindEnumTypeByName(self, full_name: str) -> _d.EnumDescriptor:  # noqa: N802
        return self._enums[full_name]


_default_pool = DescriptorPool()


def Default() -> DescriptorPool:  # noqa: N802
    return _default_pool
