"""Custom Spark data sources (Python DataSource API, Spark 4+)."""

from .pydelta_source import PyDeltaDataSource
from .synthetic import SyntheticDocsDataSource, register_sources

__all__ = [
    "PyDeltaDataSource",
    "SyntheticDocsDataSource",
    "register_sources",
]
