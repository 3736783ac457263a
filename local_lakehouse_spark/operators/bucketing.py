"""Bucketed table layout — the shuffle-free co-located join path.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders)
is shuffling both sides on the join key. Writing both tables
bucketed by that key moves the shuffle to WRITE TIME, once; every
subsequent join/aggregation on the key reads co-located buckets and
plans a sort-merge join with ZERO Exchange on either side.

Spark specifics encoded here:
- bucketing requires a catalog table (``saveAsTable``) — a bare
  ``parquet(path)`` write loses bucket metadata; we register the
  table with an explicit ``path`` option so the data lives where the
  caller says (external-table parity with the metastore layer).
- both sides must have the SAME bucket count (or a multiple, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
- ``sortBy`` on the bucket key lets the sort-merge join skip its
  sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog
    table at ``path``."""
    w = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables. When both are bucketed on
    the join key with equal bucket counts, the physical plan contains
    no Exchange (verify with ``df.explain()`` — the test suite
    asserts it)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
