"""Literal → enum coercion for user-facing string args.

Parity: /root/reference/uchelper/utils.py:7-60 (the reference accepts
``Literal[...] | Enum`` everywhere and coerces); same here.
"""

from __future__ import annotations

from typing import Union

from .exceptions import UnsupportedOperationError
from .models import FileType, SchemaEvolution, TableType, WriteMode


def _coerce(value, enum_cls):
    if isinstance(value, enum_cls):
        return value
    if isinstance(value, str):
        try:
            return enum_cls(value.upper())
        except ValueError:
            pass
    raise UnsupportedOperationError(
        f"Invalid {enum_cls.__name__}: {value!r} "
        f"(expected one of {[e.value for e in enum_cls]})"
    )


def to_write_mode(value: Union[str, WriteMode]) -> WriteMode:
    return _coerce(value, WriteMode)


def to_schema_evolution(value: Union[str, SchemaEvolution]) -> SchemaEvolution:
    return _coerce(value, SchemaEvolution)


def to_file_type(value: Union[str, FileType]) -> FileType:
    return _coerce(value, FileType)


def to_table_type(value: Union[str, TableType]) -> TableType:
    return _coerce(value, TableType)
