"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize_small_scan(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Redistribute a degenerate scan before CPU-heavy per-row work.

    Single-file tables with one parquet row group scan as ONE task no
    matter the cluster size (a parquet file only splits at row-group
    boundaries), which serializes everything fused onto the scan —
    tokenization, shingling, hashing. When the scan yields far fewer
    partitions than the cluster has cores, one round-robin shuffle of
    the raw rows buys full parallelism for every downstream stage.

    At production scale this is a no-op: a 100 TB table has thousands
    of splits, the condition is false, and no shuffle is added. The
    check costs a file-listing, not a job.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor <= target:
        return df.repartition(target)
    return df
