"""Shared guard for ``spark.sql.python.filterPushdown.enabled``.

Spark 4 hard-fails any batch read through a Python DataSource whose
reader *implements* ``pushFilters`` when
``spark.sql.python.filterPushdown.enabled`` is false (its default):
DATA_SOURCE_PUSHDOWN_DISABLED. Every ``register()`` in this package
therefore flips the conf to true — but ONLY when it still holds the
false default. A session whose user explicitly set it to false keeps
their choice and those reads fail with Spark's own clear error,
rather than a register call silently overriding a deliberate
session-wide setting that also governs every other Python source.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession

_KEY = "spark.sql.python.filterPushdown.enabled"


def ensure_filter_pushdown(spark: "SparkSession") -> None:
    """Enable Python-source filter pushdown unless the user set it."""
    try:
        explicitly_set = bool(
            spark.sparkContext.getConf().get(_KEY, None) is not None
            or spark._jsparkSession.sessionState().conf().contains(_KEY)
        )
    except Exception:
        explicitly_set = False
    if not explicitly_set:
        spark.conf.set(_KEY, "true")
