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

# Round-8 cap ordering (driver cap = 50 queries/round; stamps are
# CUMULATIVE across CORRECTNESS_r01..r07 — the r7 union is 201/201
# oracle-eligible green). The cap fills by STAMP AGE (judge r7 #1):
# 1. never-stamped first: y32 in-commit timestamps + writer-feature
#    checkpoint round-trip, y33 Iceberg v2 read/append/position-
#    delete — new this round;
# 2. ALL 39 r3-era stamps (q58–q68 + the x13–x70 band) — they
#    predate four rounds of engine churn (DV reads, column mapping,
#    checkpoint schema changes all touch shared read paths);
# 3. the remaining 9 slots go to the oldest r4-era stamps
#    (q69–q74 + x03/x04/x38).
# Everything past the cap keeps an r4+ stamp AND a same-round local
# green in CORRECTNESS_LOCAL_r08.json; the r4 tail (38 queries)
# rotates in r9.
_NEVER_STAMPED = [
    "y32_in_commit_timestamps",
    "y33_iceberg_read",
]
_R3_ERA = [
    "q58_tpch_q19_disjunctive",
    "q59_tpch_q20_excess_inventory",
    "q60_tpch_q21_waiting_suppliers",
    "q61_tpch_q22_sales_opportunity",
    "q62_higher_order_fns",
    "q63_time_range_frame",
    "q64_argmax_aggregation",
    "q65_multiset_ops",
    "q66_recursive_cte",
    "q67_cube",
    "q68_filter_clause",
    "x13_sessionize",
    "x16_streaming_tumbling",
    "x18_streaming_sessionize_stateful",
    "x25_streaming_rollup_table",
    "x32_streaming_interval_join",
    "x35_audio_features",
    "x36_streaming_left_outer_join",
    "x37_histogram_quantiles",
    "x39_sequence_packing",
    "x40_decontaminate",
    "x41_vocab_zipf",
    "x42_tfidf_top_terms",
    "x44_funnel_stages",
    "x48_bigram_lm",
    "x49_corpus_pipeline",
    "x50_stateful_running_totals",
    "x51_groupwise_regression",
    "x59_count_min_sketch",
    "x61_bloom_join",
    "x62_bpe_merges",
    "x63_weighted_sample",
    "x64_pareto_frontier",
    "x65_dedup_survivors",
    "x66_pagerank",
    "x67_pmi_collocations",
    "x68_repeated_spans",
    "x69_lm_doc_score",
    "x70_contiguous_ids",
]
_R4_ERA_HEAD = [
    "q69_numeric_range_frame",
    "q70_regexp_extract_all",
    "q71_ignore_nulls_locf",
    "q72_null_safe_ops",
    "q73_variant_json",
    "q74_pipe_syntax",
    "x03_dedup_minhash_lsh",
    "x04_dedup_simhash",
    "x38_mixture_sample",
]
_PRIORITY = _NEVER_STAMPED + _R3_ERA + _R4_ERA_HEAD
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
