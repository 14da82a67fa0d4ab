"""Runtime-version gate — generated modules call this at import.

The shim accepts any generated code; version enforcement only makes
sense for the real runtime, so validation is a no-op.
"""

from enum import Enum


class Domain(Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


MAJOR = 6
MINOR = 33
PATCH = 0


def ValidateProtobufRuntimeVersion(*_args, **_kwargs) -> None:  # noqa: N802
    return None
