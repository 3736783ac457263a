"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``local_lakehouse_spark.queries`` (the
declared SURVEY.md §2.C inventory) and
``local_lakehouse_spark.operators`` (training-data-pipeline
extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from local_lakehouse_spark.queries import QUERY_SPECS as _CORE
from local_lakehouse_spark.queries_ext import EXT_QUERY_SPECS as _EXT

_ALL = {**_CORE, **_EXT}

# Ordered so a count-capped correctness run still covers the entries
# that round 1's artifact never reached (it stopped at 50): the
# x-series extensions and the two round-1 failures come first; the
# driver-green q-series follows. Harmless if the driver runs all 81.
_PRIORITY = (
    [n for n in _ALL if n.startswith("x") and n not in ("x01_dedup_exact", "x02_dedup_ngram_jaccard", "x03_dedup_minhash_lsh")]
    + ["q05_null_coalesce", "q32_json_extract"]
    + ["x01_dedup_exact", "x02_dedup_ngram_jaccard", "x03_dedup_minhash_lsh"]
)
QUERY_SPECS = {
    **{n: _ALL[n] for n in _PRIORITY},
    **{n: s for n, s in _ALL.items() if n not in _PRIORITY},
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing
    summary (scan → filter → hash agg → sort, the canonical
    Catalyst-optimized pipeline). Driver checks rows > 0."""
    return QUERY_SPECS["q16_tpch_q1_agg"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERY_SPECS.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → driver records rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in QUERY_SPECS.items()
        if spec.oracle is not None
    }
