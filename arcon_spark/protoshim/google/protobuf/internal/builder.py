"""Module-building hooks called by generated ``*_pb2`` code.

``BuildMessageAndEnumDescriptors`` injects ``_UPPERCASED`` descriptor
globals (the names generated code later pokes ``_serialized_start``
onto); ``BuildTopDescriptorsAndMessages`` injects the concrete message
classes, enum wrappers, and top-level enum value constants — matching
the public generated-code contract (e.g. ``stateMessage.StateRequest``,
``stateMessage.PRE_INIT``).
"""

from __future__ import annotations

from . import python_message
from .enum_type_wrapper import EnumTypeWrapper


def _descriptor_key(full_name: str, package: str) -> str:
    local = full_name[len(package) + 1 :] if package and full_name.startswith(package + ".") else full_name
    return "_" + local.replace(".", "_").upper()


def _walk_messages(file_des):
    stack = list(file_des.message_types_by_name.values())
    while stack:
        desc = stack.pop()
        yield desc
        stack.extend(desc.nested_types)


def BuildMessageAndEnumDescriptors(file_des, module_globals) -> None:  # noqa: N802
    package = file_des.package
    for desc in _walk_messages(file_des):
        module_globals[_descriptor_key(desc.full_name, package)] = desc
        for enum in desc.enum_types:
            module_globals[_descriptor_key(enum.full_name, package)] = enum
    for enum in file_des.enum_types_by_name.values():
        module_globals[_descriptor_key(enum.full_name, package)] = enum


def BuildTopDescriptorsAndMessages(  # noqa: N802
    file_des, module_name: str, module_globals
) -> None:
    for desc in _walk_messages(file_des):
        cls = python_message.build_message_class(desc)
        cls.__module__ = module_name
        if desc.containing_type is None:
            module_globals[desc.name] = cls
        else:  # nested classes hang off the parent, mirroring protoc output
            parent = python_message.build_message_class(desc.containing_type)
            setattr(parent, desc.name, cls)
    for enum in file_des.enum_types_by_name.values():
        wrapper = EnumTypeWrapper(enum)
        module_globals[enum.name] = wrapper
        for value in enum.values:
            module_globals[value.name] = value.number
