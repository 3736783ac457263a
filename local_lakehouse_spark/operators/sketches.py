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

from pyspark.sql import DataFrame, Window
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


def histogram_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 1000,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Approximate per-group quantiles from a FIXED-BIN histogram —
    the mergeable-sketch quantile for bounded domains.

    Each row maps to bin floor((v - lo) / (hi - lo) * n_bins)
    (clamped), the per-group histogram is one groupBy over (group,
    bin) then one over (group), and quantile q is reported as the
    LOWER EDGE of the first bin whose cumulative count reaches
    ceil(q * n). Error is bounded by the bin width ((hi-lo)/n_bins),
    state per group is at most n_bins longs, and histograms merge by
    vector addition — so partial aggregation (map-side combine) does
    most of the work and re-rollups to coarser groupings never
    rescan. Every step is integer/closed-form arithmetic, which is
    what makes it ORACLE-CHECKABLE (x37) where rank-based sketches
    (t-digest, KLL, percentile_approx) are implementation-defined.

    Output: (group_cols..., n_rows, q_<pct> per requested quantile).
    """
    span = hi - lo
    bin_col = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col) - lo) / span * n_bins).cast("int"),
        ),
    )
    hist = (
        df.select(*group_cols, bin_col.alias("__bin"))
        .groupBy(*group_cols, "__bin")
        .agg(F.count("*").alias("__cnt"))
    )
    w = Window.partitionBy(*group_cols).orderBy("__bin")
    cum = hist.withColumn("__cum", F.sum("__cnt").over(w)).withColumn(
        "__n", F.sum("__cnt").over(Window.partitionBy(*group_cols))
    )
    aggs = [F.max("__n").alias("n_rows")]
    for q in quantiles:
        rank = F.ceil(F.col("__n") * F.lit(q))
        edge = F.lit(lo) + F.col("__bin") * F.lit(span / n_bins)
        aggs.append(
            F.min(F.when(F.col("__cum") >= rank, edge)).alias(
                f"q_{int(q * 100)}"
            )
        )
    return cum.groupBy(*group_cols).agg(*aggs).orderBy(*group_cols)
