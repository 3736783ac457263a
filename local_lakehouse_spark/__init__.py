"""local_lakehouse_spark — a PySpark-native local lakehouse engine.

Capability surface modeled on VillePuuska/Local-Lakehouse (`uchelper`,
studied read-only at /root/reference/): three-level catalog namespace,
multi-format table I/O with write-mode × schema-evolution matrix,
Delta-style MERGE, and full SQL over catalog tables — re-expressed on
SparkSession + Catalyst instead of UC-server + Polars + DuckDB, plus
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis) the reference does not have.
"""

from .client import LakehouseClient
from .exceptions import (
    AlreadyExistsError,
    DoesNotExistError,
    LakehouseError,
    SchemaMismatchError,
    SQLEngineSetupError,
    UnsupportedOperationError,
)
from .models import (
    Catalog,
    Column,
    DataType,
    FileType,
    Schema,
    SchemaEvolution,
    Table,
    TableType,
    WriteMode,
)
from .session import get_spark

__all__ = [
    "LakehouseClient",
    "Catalog",
    "Column",
    "DataType",
    "FileType",
    "Schema",
    "SchemaEvolution",
    "Table",
    "TableType",
    "WriteMode",
    "get_spark",
    "AlreadyExistsError",
    "DoesNotExistError",
    "LakehouseError",
    "SchemaMismatchError",
    "SQLEngineSetupError",
    "UnsupportedOperationError",
]

__version__ = "0.1.0"
