"""Distributed 2-D Pareto frontier (skyline): rows not dominated on a
(minimize, maximize) objective pair — e.g. cheapest-largest parts,
best quality-per-token documents.

The naive formulation is a quadratic NOT-EXISTS self-join. The 2-D
structure collapses it to a prefix scan: a row is dominated iff some
strictly-cheaper row reaches its size (prefix max over prices), or a
same-price row strictly exceeds it (per-price group max). That is:

1. ``groupBy(min_col) → max(max_col)`` — one shuffle, map-side
   combined, output bounded by the distinct-value domain of
   ``min_col`` (≪ rows).
2. A SCALABLE prefix max over the distinct-price table: range-
   partition by price, per-partition running max (window keyed on
   ``spark_partition_id`` — each partition scans independently),
   then per-partition totals (one tiny row each) get their own
   prefix pass and broadcast back as offsets. No global single-task
   window over data-sized input; the only single-task step touches
   ``#partitions`` rows.
3. Broadcast the (price → prev_max, grp_max) table back onto the
   fact rows when small, else shuffle-join on price: the dominance
   test is then a scan-stage predicate.

Equal (price, size) duplicates all survive — dominance requires one
STRICT inequality, matching the NOT-EXISTS definition the DuckDB
oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(
    df: DataFrame, min_col: str, max_col: str, broadcast_domain: bool = True
) -> DataFrame:
    """Rows of ``df`` on the (minimize ``min_col``, maximize
    ``max_col``) skyline. Columns are preserved.

    ``broadcast_domain=False`` switches the final domain join to a
    shuffle join for min_col domains too large to broadcast."""
    grp = df.groupBy(min_col).agg(F.max(max_col).alias("__grp_max"))

    parts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    d = (
        grp.repartitionByRange(parts, F.col(min_col))
        .withColumn("__pid", F.spark_partition_id())
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(min_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("__local_prev", F.max("__grp_max").over(w_local))
    # Materialize the domain table ONCE (r12, guide §3.3): `d` feeds
    # both the offsets aggregate and the final join, so without this
    # the groupBy → repartitionByRange → window subtree executed
    # twice (plus its range exchange re-samples per execution). The
    # persisted table is O(distinct min_col) rows. This also pins ONE
    # __pid assignment for both consumers by construction instead of
    # relying on the two executions sampling identical range bounds.
    d = d.localCheckpoint(eager=False)

    # Per-partition totals: #partitions rows — the one place a global
    # window is safe, because its input is O(partitions), not O(rows).
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("__pid")
        .agg(F.max("__grp_max").alias("__pmax"))
        .withColumn("__offset", F.max("__pmax").over(w_off))
        .select("__pid", "__offset")
    )
    d = d.join(F.broadcast(offsets), "__pid").select(
        F.col(min_col).alias("__price"),
        F.col("__grp_max"),
        # greatest() skips nulls (first partition has no offset,
        # first row per partition no local prefix)
        F.greatest("__local_prev", "__offset").alias("__prev_max"),
    )

    domain = F.broadcast(d) if broadcast_domain else d
    joined = df.join(domain, df[min_col] == d["__price"], "inner")
    dominated = (
        F.col("__prev_max").isNotNull()
        & (F.col("__prev_max") >= F.col(max_col))
    ) | (F.col("__grp_max") > F.col(max_col))
    return joined.filter(~dominated).select(*df.columns)
