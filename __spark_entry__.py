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

# Round-6 cap ordering (driver cap = 50 queries/round; stamps are
# CUMULATIVE across CORRECTNESS_r01..r05 — the r5 union is
# 179/179 oracle-eligible green). With nothing left unstamped, this
# round rotates the cap onto STAMP FRESHNESS: the 47 rows whose only
# driver evidence is the round-1 artifact, earned against fixtures
# the driver has since regenerated (the r3 events.ts NANOS→MICROS
# flip proved fixtures drift), re-prove first. Those are the r1-era
# rows: q01–q47 minus q05/q32 (both r2-stamped) plus x01/x02 — 47
# rows — and the cap's last 3 slots go to the rows-only trio
# x06/x14/x22, which this round gained RUNTIME accuracy contracts
# (recall@k vs the exact baseline; HLL error bound) so their
# `no_oracle` driver rows now fail loudly on regression instead of
# only counting rows. Everything past the cap keeps an r2+ stamp AND
# a same-round local green in CORRECTNESS_LOCAL_r06.json.
_R1_ERA = (
    [
        n
        for n in _ALL
        if n.startswith("q")
        and n < "q48"
        and not n.startswith(("q05", "q32"))  # r2-stamped
    ]
    + ["x01_dedup_exact", "x02_dedup_ngram_jaccard"]
)
_ROWS_ONLY_WITH_NEW_CONTRACTS = [
    "x06_ann_lsh_topk",
    "x14_embedding_near_dup",
    "x22_approx_distinct_hll",
]
# Never-stamped queries always lead the cap (the round-5 rule): the
# round-6 Delta row-level / governance series (y10-y20: DV reads and
# DML, PURGE, OPTIMIZE, appendOnly, TIMESTAMP AS OF, constraints,
# CDC fast path, SHALLOW CLONE) needs first driver stamps; the
# displaced tail of the r1-era rotation keeps a same-round local
# green in CORRECTNESS_LOCAL_r06.json and rotates next round.
_NEVER_STAMPED = [
    "y10_deletion_vector_read",
    "y11_column_mapping_read",
    "y12_dv_delete",
    "y13_dv_update",
    "y14_dv_purge",
    "y15_delta_optimize",
    "y16_append_only_governance",
    "y17_timestamp_as_of",
    "y18_check_constraints",
    "y19_cdc_log_replay",
    "y20_shallow_clone",
    "y21_generated_columns",
]
_PRIORITY = (
    _NEVER_STAMPED
    + _R1_ERA
    + _ROWS_ONLY_WITH_NEW_CONTRACTS
    # next-oldest stamps follow (r2), for drivers that run past the cap
    + [n for n in _ALL if n.startswith(("q05", "q32"))]
    + [
        "x05_ann_cosine_topk",
        "x07_language_id",
        "x08_quality_score",
        "x09_token_count",
        "x10_fingerprint",
        "x11_asof_join",
        "x12_events_hourly",
        "x15_multimodal_decode",
        "x17_ann_ivf_topk",
        "x19_clean_text",
        "x20_corpus_filter",
        "x21_streaming_dedup",
    ]
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
