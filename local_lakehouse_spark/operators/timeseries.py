"""Time-series regularization: calendar scaffolding + gap filling —
the hypertable-rollup companion ops (continuous daily/hourly frames
with last-observation-carried-forward), used for feature tables and
monitoring rollups where every (key, bucket) must exist.

Shape at scale:

- the scaffold is GENERATED per key from its own [min, max] bucket
  bounds (sequence + explode inside the scan stage) — never a global
  calendar crossJoin, so sparse keys don't inflate the frame beyond
  their own active range;
- the observed rollup is one groupBy(key, bucket);
- the scaffold⋈rollup join is keyed on (key, bucket) — co-partitioned
  with the rollup's own shuffle;
- LOCF is ``last(value, ignorenulls=True)`` over (key, ORDER BY
  bucket) — one window shuffle already satisfied by the join's
  partitioning.

Money-typed values aggregate in integer cents so the frame is
hash-comparable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_daily_locf(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(key, day, observed, day_cents, filled_cents): one row for
    EVERY day in each key's active range; missing days carry the
    previous observed daily total forward.

    ``day_cents`` is NULL on gap days (the raw rollup), while
    ``filled_cents`` is the LOCF series a feature pipeline consumes.
    """
    day = F.col(ts_col).cast("date")
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
    daily = (
        events.select(F.col(key_col).alias("key"), day.alias("day"), cents.alias("c"))
        .groupBy("key", "day")
        .agg(F.sum("c").alias("day_cents"))
    )
    scaffold = (
        daily.groupBy("key")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "key",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scaffold.join(daily, ["key", "day"], "left")
        .select(
            "key",
            "day",
            F.col("day_cents").isNotNull().alias("observed"),
            "day_cents",
            F.last("day_cents", ignorenulls=True).over(w).alias("filled_cents"),
        )
    )


def ewma_daily(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
) -> DataFrame:
    """(key, day, ewma): exponentially weighted moving average of the
    daily totals per key — the smoothing/anomaly-baseline op.

    EWMA is a SEQUENTIAL recurrence (y_t = α·x_t + (1-α)·y_{t-1}), so
    it cannot be a plain window aggregate. Distributed shape: daily
    totals shuffle once on key, each key's (bounded) series is folded
    in-row — ``array_sort(collect_list(...))`` then one higher-order
    ``aggregate`` that appends α·x + (1-α)·prev step by step. The
    fold's operation order is deterministic (sorted by day), so the
    doubles are bit-identical to the DuckDB recursive-CTE twin that
    runs the same recurrence.

    Per-key series length is bounded by the calendar range (days), so
    the in-row array is small even when the raw event count is not —
    the groupBy(key, day) pre-aggregation is what guarantees that.
    """
    day = F.col(ts_col).cast("date")
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
    daily = (
        events.select(F.col(key_col).alias("key"), day.alias("day"), cents.alias("c"))
        .groupBy("key", "day")
        .agg(F.sum("c").alias("c"))
    )
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("day"), F.col("c")))
    )
    series = daily.groupBy("key").agg(arr.alias("a"))
    ew = F.aggregate(
        F.slice(F.col("a"), 2, F.size("a") - 1),
        F.array(
            F.struct(
                F.element_at("a", 1)["day"].alias("day"),
                F.element_at("a", 1)["c"].cast("double").alias("ewma"),
            )
        ),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.struct(
                    x["day"].alias("day"),
                    (
                        F.lit(alpha) * x["c"].cast("double")
                        + F.lit(1 - alpha) * F.element_at(acc, -1)["ewma"]
                    ).alias("ewma"),
                )
            ),
        ),
    )
    return (
        series.select("key", F.explode(ew).alias("e"))
        .select("key", F.col("e.day").alias("day"), F.col("e.ewma").alias("ewma"))
    )
