"""Pydantic models for the three-level catalog namespace.

Parity: /root/reference/uchelper/models.py:13-214 (Catalog, Schema,
Column, Table, DataType, FileType, TableType). The reference's
DataType enum is verbatim Unity Catalog's ColumnTypeName, which is
itself Spark's type system — so these models map 1:1 onto
pyspark.sql.types (see types_map.py).
"""

from __future__ import annotations

import enum
from datetime import datetime, timezone
from typing import Optional
from uuid import uuid4

from pydantic import BaseModel, Field

# Table property used to store default merge columns, identical key to
# /root/reference/uchelper/models.py:8-10.
DEFAULT_MERGE_COLUMNS_PROPERTY = "uchelper_default_merge_columns_field_donottouch"


class DataType(str, enum.Enum):
    """Column data types — Unity Catalog / Spark type names.

    Parity: /root/reference/uchelper/models.py:41-88.
    """

    BOOLEAN = "BOOLEAN"
    BYTE = "BYTE"
    SHORT = "SHORT"
    INT = "INT"
    LONG = "LONG"
    FLOAT = "FLOAT"
    DOUBLE = "DOUBLE"
    DATE = "DATE"
    TIMESTAMP = "TIMESTAMP"
    TIMESTAMP_NTZ = "TIMESTAMP_NTZ"
    STRING = "STRING"
    BINARY = "BINARY"
    DECIMAL = "DECIMAL"
    INTERVAL = "INTERVAL"
    ARRAY = "ARRAY"
    STRUCT = "STRUCT"
    MAP = "MAP"
    CHAR = "CHAR"
    NULL = "NULL"
    USER_DEFINED_TYPE = "USER_DEFINED_TYPE"
    TABLE_TYPE = "TABLE_TYPE"


class TableType(str, enum.Enum):
    """Parity: /root/reference/uchelper/models.py:141-150."""

    MANAGED = "MANAGED"
    EXTERNAL = "EXTERNAL"


class FileType(str, enum.Enum):
    """Storage formats. Parity: /root/reference/uchelper/models.py:153-172.

    The reference implements DELTA/PARQUET/CSV/AVRO in its I/O layer;
    ours implements PARQUET/CSV/JSON/ORC natively via Spark, and
    DELTA/AVRO when the corresponding Spark packages are installed.
    ICEBERG (beyond the reference enum) reads/appends through the
    pure-Python spec implementation (sources/iceberg_py.py).
    """

    DELTA = "DELTA"
    CSV = "CSV"
    JSON = "JSON"
    AVRO = "AVRO"
    PARQUET = "PARQUET"
    ORC = "ORC"
    TEXT = "TEXT"
    ICEBERG = "ICEBERG"


class WriteMode(str, enum.Enum):
    """Parity: /root/reference/uchelper/dataframe.py:12-14."""

    APPEND = "APPEND"
    OVERWRITE = "OVERWRITE"


class SchemaEvolution(str, enum.Enum):
    """Parity: /root/reference/uchelper/dataframe.py:17-20."""

    STRICT = "STRICT"
    MERGE = "MERGE"
    OVERWRITE = "OVERWRITE"


class Catalog(BaseModel):
    """Parity: /root/reference/uchelper/models.py:13-23."""

    name: str
    comment: Optional[str] = None
    properties: dict[str, str] = Field(default_factory=dict)
    created_at: Optional[datetime] = None
    updated_at: Optional[datetime] = None
    id: Optional[str] = None

    def stamp_created(self) -> "Catalog":
        now = datetime.now(timezone.utc)
        return self.model_copy(
            update={"created_at": now, "updated_at": None, "id": str(uuid4())}
        )


class Schema(BaseModel):
    """Parity: /root/reference/uchelper/models.py:26-38."""

    name: str
    catalog_name: str
    comment: Optional[str] = None
    properties: dict[str, str] = Field(default_factory=dict)
    full_name: Optional[str] = None
    created_at: Optional[datetime] = None
    updated_at: Optional[datetime] = None
    schema_id: Optional[str] = None

    def set_full_name(self) -> "Schema":
        return self.model_copy(
            update={"full_name": f"{self.catalog_name}.{self.name}"}
        )


class Column(BaseModel):
    """Parity: /root/reference/uchelper/models.py:96-138.

    ``type_text``/``type_json`` renderings (models.py:108-134) are
    produced from the Spark StructField in types_map.py.
    """

    name: str
    data_type: DataType
    type_precision: Optional[int] = None
    type_scale: Optional[int] = None
    position: int = 0
    nullable: bool = True
    partition_index: Optional[int] = None
    comment: Optional[str] = None
    # Spark simpleString for nested types (ARRAY/STRUCT/MAP element info),
    # e.g. "array<float>"; the reference loses element types, we keep them.
    type_text: Optional[str] = None


class Table(BaseModel):
    """Parity: /root/reference/uchelper/models.py:175-214."""

    name: str
    catalog_name: str
    schema_name: str
    table_type: TableType
    file_type: FileType
    columns: list[Column] = Field(default_factory=list)
    storage_location: Optional[str] = None
    comment: Optional[str] = None
    # Optional to mirror the reference (models.py:188): None means
    # "leave unchanged" in update_table, distinct from {} = "clear".
    properties: Optional[dict[str, str]] = Field(default_factory=dict)
    created_at: Optional[datetime] = None
    updated_at: Optional[datetime] = None
    table_id: Optional[str] = None

    @property
    def full_name(self) -> str:
        return f"{self.catalog_name}.{self.schema_name}.{self.name}"

    def default_merge_columns(self) -> list[str]:
        """Semicolon-joined property, parity models.py:197-214."""
        raw = (self.properties or {}).get(DEFAULT_MERGE_COLUMNS_PROPERTY, "")
        return [c for c in raw.split(";") if c]

    def set_default_merge_columns(self, cols: list[str]) -> None:
        if self.properties is None:
            self.properties = {}
        self.properties[DEFAULT_MERGE_COLUMNS_PROPERTY] = ";".join(cols)

    def partition_columns(self) -> list[Column]:
        """Ordered partition columns, parity dataframe.py:172-177."""
        parts = [c for c in self.columns if c.partition_index is not None]
        parts.sort(key=lambda c: c.partition_index)  # type: ignore[arg-type,return-value]
        return parts
