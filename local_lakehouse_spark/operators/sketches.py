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

from pyspark.sql import Column, DataFrame, Window
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


def _md5_u48(col: Column) -> Column:
    """48-bit little-endian integer from md5 digest bytes 8..13 —
    the low 6 bytes of DuckDB's ``md5_number_lower`` (= uint64 of
    digest bytes 8..15), so both engines derive the IDENTICAL value:
    Spark composes it from hex chars, DuckDB masks the builtin.
    48 bits keeps every intermediate in signed-BIGINT range."""
    hx = F.md5(col)
    val = F.lit(0).cast("bigint")
    for j in range(6):  # LE byte j = hex chars 17+2j..18+2j (1-based)
        byte = F.conv(F.substring(hx, 17 + 2 * j, 2), 16, 10).cast("bigint")
        val = val + byte * F.lit(1 << (8 * j))
    return val


def count_min_sketch(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(seed, bucket, cnt) — the d×w count-min counter matrix over a
    stream of items: row ``seed`` holds counts hashed by
    md5(seed|item) % width. MERGEABLE by construction (union two
    sketches and sum cnt per (seed, bucket)) and bounded at d×w rows
    regardless of input size — the heavy-hitter / frequency-estimate
    sketch of a 100 TB pipeline, next to HLL (distinct) and the
    fixed-bin histogram (quantiles).

    Scale shape: one explode (×depth) → one (seed, bucket)-keyed agg
    with map-side partials; the shuffle carries at most d×w rows per
    partition.
    """
    seeded = df.select(
        F.col(item_col).cast("string").alias("item"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed"),
    )
    bucket = _md5_u48(
        F.concat_ws("|", F.col("seed").cast("string"), F.col("item"))
    ) % width
    return (
        seeded.select("seed", bucket.alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, queries: DataFrame, item_col: str,
    depth: int = 4, width: int = 256,
) -> DataFrame:
    """(item, est) — CMS point estimate: min over the d rows of the
    matching bucket count (0 when a bucket is empty). Overestimates
    only (collisions add, never subtract): est ≥ true count, with
    error ≤ 2N/w at 1-e^-d confidence — asserted in tests."""
    q = queries.select(F.col(item_col).cast("string").alias("item")).distinct()
    seeded = q.select(
        "item",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed"),
    )
    bucket = _md5_u48(
        F.concat_ws("|", F.col("seed").cast("string"), F.col("item"))
    ) % width
    probes = seeded.select("item", "seed", bucket.alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
