"""Custom Spark data sources (Python DataSource API, Spark 4+)."""

from .synthetic import SyntheticDocsDataSource, register_sources

__all__ = ["SyntheticDocsDataSource", "register_sources"]
