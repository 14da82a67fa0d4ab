"""Descriptor objects for the vendored protobuf shim.

Mirrors the public descriptor API shape (names, field type/label
constants from the public descriptor.proto) without any code from the
protobuf distribution.  Generated modules poke attributes like
``_serialized_start`` onto these, so instances allow arbitrary
attribute assignment.
"""

from __future__ import annotations

# Generated code checks this to decide between the C and Python paths.
_USE_C_DESCRIPTORS = False


class DescriptorBase:
    def __init__(self) -> None:
        self._loaded_options = None


class FieldDescriptor(DescriptorBase):
    # Wire types per field type — public descriptor.proto enum values.
    TYPE_DOUBLE = 1
    TYPE_FLOAT = 2
    TYPE_INT64 = 3
    TYPE_UINT64 = 4
    TYPE_INT32 = 5
    TYPE_FIXED64 = 6
    TYPE_FIXED32 = 7
    TYPE_BOOL = 8
    TYPE_STRING = 9
    TYPE_GROUP = 10
    TYPE_MESSAGE = 11
    TYPE_BYTES = 12
    TYPE_UINT32 = 13
    TYPE_ENUM = 14
    TYPE_SFIXED32 = 15
    TYPE_SFIXED64 = 16
    TYPE_SINT32 = 17
    TYPE_SINT64 = 18

    LABEL_OPTIONAL = 1
    LABEL_REQUIRED = 2
    LABEL_REPEATED = 3

    def __init__(
        self,
        name: str,
        number: int,
        type: int,  # noqa: A002 - public API name
        label: int,
        json_name: str | None = None,
        proto3_optional: bool = False,
        type_name: str = "",
    ) -> None:
        super().__init__()
        self.name = name
        self.number = number
        self.type = type
        self.label = label
        self.json_name = json_name or name
        self.proto3_optional = proto3_optional
        # Raw ".pkg.Message" reference, resolved by the pool into the
        # message_type / enum_type attributes below.
        self._type_name = type_name
        self.message_type: Descriptor | None = None
        self.enum_type: EnumDescriptor | None = None
        self.containing_oneof: OneofDescriptor | None = None
        self.containing_type: Descriptor | None = None

    @property
    def is_repeated(self) -> bool:
        return self.label == self.LABEL_REPEATED

    @property
    def is_map(self) -> bool:
        return (
            self.label == self.LABEL_REPEATED
            and self.type == self.TYPE_MESSAGE
            and self.message_type is not None
            and getattr(self.message_type, "_is_map_entry", False)
        )

    @property
    def has_presence(self) -> bool:
        """proto3 explicit presence: message fields, oneof members
        (including the synthetic oneof of `optional` fields)."""
        if self.is_repeated:
            return False
        return self.type == self.TYPE_MESSAGE or self.containing_oneof is not None


class OneofDescriptor(DescriptorBase):
    def __init__(self, name: str) -> None:
        super().__init__()
        self.name = name
        self.fields: list[FieldDescriptor] = []

    @property
    def is_synthetic(self) -> bool:
        return len(self.fields) == 1 and self.fields[0].proto3_optional


class EnumValueDescriptor(DescriptorBase):
    def __init__(self, name: str, number: int) -> None:
        super().__init__()
        self.name = name
        self.number = number


class EnumDescriptor(DescriptorBase):
    def __init__(self, name: str, full_name: str, values: list[EnumValueDescriptor]) -> None:
        super().__init__()
        self.name = name
        self.full_name = full_name
        self.values = values
        self.values_by_name = {v.name: v for v in values}
        self.values_by_number: dict[int, EnumValueDescriptor] = {}
        for v in values:  # first wins on aliases, like the real runtime
            self.values_by_number.setdefault(v.number, v)
        self.containing_type: Descriptor | None = None
        self.file: FileDescriptor | None = None


class Descriptor(DescriptorBase):
    def __init__(
        self,
        name: str,
        full_name: str,
        fields: list[FieldDescriptor],
        oneofs: list[OneofDescriptor],
        nested_types: list["Descriptor"],
        enum_types: list[EnumDescriptor],
    ) -> None:
        super().__init__()
        self.name = name
        self.full_name = full_name
        self.fields = fields
        self.fields_by_name = {f.name: f for f in fields}
        self.fields_by_number = {f.number: f for f in fields}
        self.oneofs = oneofs
        self.oneofs_by_name = {o.name: o for o in oneofs}
        self.nested_types = nested_types
        self.nested_types_by_name = {t.name: t for t in nested_types}
        self.enum_types = enum_types
        self.enum_types_by_name = {e.name: e for e in enum_types}
        self.containing_type: Descriptor | None = None
        self.file: FileDescriptor | None = None
        self._is_map_entry = False  # set true for synthetic map<K,V> entries
        # Populated by the message factory; GetPrototype-style lookup.
        self._concrete_class = None


class FileDescriptor(DescriptorBase):
    def __init__(self, name: str, package: str, serialized_pb: bytes) -> None:
        super().__init__()
        self.name = name
        self.package = package
        self.serialized_pb = serialized_pb
        self.message_types_by_name: dict[str, Descriptor] = {}
        self.enum_types_by_name: dict[str, EnumDescriptor] = {}
