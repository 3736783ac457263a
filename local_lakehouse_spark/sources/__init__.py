"""Custom Spark data sources (Python DataSource API, Spark 4+)."""

from .pyavro_source import PyAvroDataSource
from .pydelta_source import PyDeltaDataSource
from .synthetic import SyntheticDocsDataSource, register_sources

__all__ = [
    "PyAvroDataSource",
    "PyDeltaDataSource",
    "SyntheticDocsDataSource",
    "register_sources",
]
