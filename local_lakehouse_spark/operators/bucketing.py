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


def register_bucketed(
    spark: SparkSession,
    table_name: str,
    path: str,
    schema_ddl: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Re-register an EXISTING bucketed dataset (written earlier by
    ``write_bucketed``, possibly in another session) as a catalog
    table without rewriting a byte. Spark records the bucket id in
    each data file's name (the ``_0000N`` suffix ``saveAsTable``
    emits), so a ``CREATE TABLE ... CLUSTERED BY ... LOCATION``
    over those files restores the zero-Exchange join path — the
    catalog is session-scoped but the layout is durable, and at
    100 TB re-bucketing terabytes because a session restarted would
    be absurd. Callers that assert the plan contract (x99) fail
    loudly if the re-registered table ever loses bucket metadata."""
    sort = f"SORTED BY ({', '.join(sort_cols)}) " if sort_cols else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table_name} ({schema_ddl}) "
        f"USING PARQUET "
        f"CLUSTERED BY ({', '.join(bucket_cols)}) {sort}"
        f"INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


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
