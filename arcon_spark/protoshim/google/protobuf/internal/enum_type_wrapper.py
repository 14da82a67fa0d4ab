"""Enum wrapper exposing value constants, Name() and Value() lookups."""

from __future__ import annotations


class EnumTypeWrapper:
    def __init__(self, enum_descriptor) -> None:
        self.DESCRIPTOR = enum_descriptor
        for value in enum_descriptor.values:
            setattr(self, value.name, value.number)

    def Name(self, number: int) -> str:  # noqa: N802
        value = self.DESCRIPTOR.values_by_number.get(number)
        if value is None:
            raise ValueError(f"enum {self.DESCRIPTOR.name} has no value {number}")
        return value.name

    def Value(self, name: str) -> int:  # noqa: N802
        value = self.DESCRIPTOR.values_by_name.get(name)
        if value is None:
            raise ValueError(f"enum {self.DESCRIPTOR.name} has no value named {name}")
        return value.number

    def keys(self):
        return [v.name for v in self.DESCRIPTOR.values]

    def values(self):
        return [v.number for v in self.DESCRIPTOR.values]

    def items(self):
        return [(v.name, v.number) for v in self.DESCRIPTOR.values]
