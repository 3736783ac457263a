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

# Round-9 cap ordering (driver cap = 50 queries/round; stamps are
# CUMULATIVE across CORRECTNESS_r01..r08 — the r8 union is 203/203
# oracle-eligible green). The cap fills by STAMP AGE (judge r7 #1,
# re-affirmed r8 #2):
# 1. never-stamped first: y34 Iceberg maintenance, y35 identity-
#    partitioned read, y36 streaming replay, y37 transform
#    partitions, y38 Delta->Iceberg convert — all new this round;
# 2. ALL 38 remaining r4-era stamps (the x43–x98 band) — the oldest
#    in the union, predating the DV/column-mapping/checkpoint/
#    Iceberg shared-read-path churn;
# 3. the remaining 7 slots go to the oldest r5-era stamps
#    (q05/q32/q55 + x54/x57/x99 + y01).
# Everything past the cap keeps an r5+ stamp AND a same-round local
# green in CORRECTNESS_LOCAL_r09.json; the r5 tail (y02–y09)
# rotates in r10.
_NEVER_STAMPED = [
    "y34_iceberg_maintenance",
    "y35_iceberg_partitioned",
    "y36_iceberg_stream_replay",
    "y37_iceberg_transform_partitions",
    "y38_iceberg_convert_from_delta",
    "y39_iceberg_add_files",
    "y40_iceberg_refs",
    "y41_iceberg_update_overwrite",
    "y42_iceberg_merge",
]
_R4_ERA = [
    "x43_word_rarity",
    "x45_cohort_retention",
    "x46_streaming_rollup_delta",
    "x47_inverted_index",
    "x52_salted_aggregation",
    "x53_salted_join",
    "x55_stream_static_enrich",
    "x56_contamination_matrix",
    "x58_sliding_window",
    "x60_sparse_cosine_pairs",
    "x71_embedding_outliers",
    "x72_gapfill_locf",
    "x73_ewma_daily",
    "x74_ab_ztest",
    "x75_psi_drift",
    "x76_train_val_test",
    "x77_event_transitions",
    "x78_conversion_latency",
    "x79_incremental_dedup",
    "x80_retrieval_pipeline",
    "x81_cdc_chunk_dedup",
    "x82_temperature_mixture",
    "x83_robust_outliers_mad",
    "x84_cms_error_audit",
    "x85_packing_audit",
    "x86_cluster_size_histogram",
    "x87_shard_skew_audit",
    "x88_label_silhouette",
    "x89_delta_stream_rollup",
    "x90_fuzzy_record_linkage",
    "x91_referential_integrity",
    "x92_scd2_intervals",
    "x93_lasttouch_attribution",
    "x94_triangle_counts",
    "x95_epoch_mixture_plan",
    "x96_video_frame_sample",
    "x97_bootstrap_ci",
    "x98_decayed_popularity",
]
_R5_ERA_HEAD = [
    # trimmed to 3 when y36-y42 joined _NEVER_STAMPED (9+38+3 = the
    # exact 50-query driver cap); x54/x57/x99/y01-y09 rotate in r10
    "q05_null_coalesce",
    "q32_json_extract",
    "q55_tpch_q15_top_supplier",
]
_PRIORITY = _NEVER_STAMPED + _R4_ERA + _R5_ERA_HEAD
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
