"""Mergeable sketches — approximate distinct counting at 100 TB.

Exact COUNT(DISTINCT) shuffles every distinct value; an HLL sketch is
a fixed-size (KB) mergeable summary, so the shuffle carries one
sketch per group per partition regardless of cardinality, and sketches
for different partitions/days/tables union losslessly — the property
that makes incremental rollups possible (sketch today's partition,
merge with yesterday's stored sketch; never rescan).

Built on Spark's Apache-DataSketches-backed hll_sketch_agg /
hll_union_agg / hll_sketch_estimate (JVM-side, codegen). No DuckDB
oracle (its approx_count_distinct is a different HLL implementation);
accuracy and merge-consistency are asserted in tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """(group_cols..., approx_distinct, n_rows) — HLL-estimated
    distinct values per group. lg_k=14 → ~0.8% relative error, 16 KB
    state per group."""
    return (
        df.groupBy(*group_cols)
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(value_col, F.lit(lg_k))
            ).alias("approx_distinct"),
            F.count("*").alias("n_rows"),
        )
        .orderBy(*group_cols)
    )


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """(group_cols..., sketch: binary) — the mergeable summaries
    themselves, for persisting alongside a partition so later rollups
    union instead of rescanning."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def merge_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    lg_k: int = 14,
) -> DataFrame:
    """Re-aggregate stored sketches to a coarser grouping (or to a
    global estimate when group_cols is empty) without touching the
    base data."""
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(F.col("sketch"), F.lit(True))
    ).alias("approx_distinct")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg).orderBy(*group_cols)
    return sketches.agg(agg)
