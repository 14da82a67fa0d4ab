"""Symbol database — registry mapping names to generated classes."""

from __future__ import annotations

from . import descriptor_pool
from .internal import python_message


class SymbolDatabase:
    def __init__(self) -> None:
        self.pool = descriptor_pool.Default()

    def RegisterMessage(self, message_cls):  # noqa: N802
        return message_cls

    def RegisterFileDescriptor(self, file_des) -> None:  # noqa: N802
        return None

    def GetPrototype(self, descriptor):  # noqa: N802
        return python_message.build_message_class(descriptor)

    def GetSymbol(self, full_name: str):  # noqa: N802
        return python_message.build_message_class(
            self.pool.FindMessageTypeByName(full_name)
        )


_default = SymbolDatabase()


def Default() -> SymbolDatabase:  # noqa: N802
    return _default
