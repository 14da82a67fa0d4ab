"""Abstract Message base + error types (public protobuf API surface)."""


class Error(Exception):
    pass


class DecodeError(Error):
    pass


class EncodeError(Error):
    pass


class Message:
    """Abstract base; concrete classes are built by internal.python_message."""

    DESCRIPTOR = None
