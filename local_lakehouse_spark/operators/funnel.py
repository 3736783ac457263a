"""Event-pipeline batch analytics: ordered funnels and cohort
retention — the product-analytics operators a training-data/event
platform runs next to its windowed aggregates (no reference analog;
the reference has no events surface at all — SURVEY §2.C note).

Both are pure DataFrame compositions (JVM expressions only) with
exact DuckDB SQL twins, declared as queries x44/x45.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame, stages: list[str]
) -> DataFrame:
    """(stage, stage_idx, n_users) — ordered conversion funnel: a user
    reaches stage k only with an event of type ``stages[k]`` STRICTLY
    AFTER their stage-(k-1) event (earliest-qualifying timestamps,
    the standard product-funnel semantics).

    Scale shape: one aggregation per stage, each over the
    stage-filtered (tiny) slice of the stream, joined user-keyed to
    the previous stage's reach — k small shuffles of |users| rows,
    never a self-join of the event stream. The per-stage reach
    DataFrames shrink monotonically, so later joins broadcast.
    """
    reach = None  # (user_id, stage_ts) of the previous stage
    counts = []
    for idx, stage in enumerate(stages):
        cur = events.filter(F.col("event_type") == stage)
        if reach is None:
            cur = cur.groupBy("user_id").agg(F.min("ts").alias("stage_ts"))
        else:
            cur = (
                cur.join(reach.withColumnRenamed("stage_ts", "prev_ts"), "user_id")
                .filter(F.col("ts") > F.col("prev_ts"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("stage_ts"))
            )
        reach = cur
        counts.append(
            cur.agg(
                F.lit(stage).alias("stage"),
                F.lit(idx).cast("int").alias("stage_idx"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("stage_idx")


def cohort_retention(events: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, n_users) — weekly cohort retention:
    users grouped by the week of their FIRST event; for each later
    week, how many of them were active. The retention triangle every
    growth dashboard draws.

    Scale shape: first-event agg (one user-keyed shuffle), joined
    back to the distinct (user, week) activity set (second shuffle),
    then a small (cohort, offset)-keyed count. The activity set is
    already deduplicated before the join, so the join input is
    |users × active-weeks|, not |events|.
    """
    first = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = (
        events.select(
            "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
        )
        .distinct()
    )
    return (
        active.join(first, "user_id")
        .select(
            F.to_date("cohort_week").alias("cohort_week"),
            (
                F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def groupwise_regression(
    events: DataFrame,
    group_col: str = "event_type",
) -> DataFrame:
    """(group, n, slope, intercept, corr) — per-group least-squares
    trend of event value over time (day index), computed purely from
    the five decomposable sums (n, Σx, Σy, Σxy, Σx²[, Σy²]) — the
    aggregate-only formulation that scales: one map-side-combined
    shuffle per group, no iteration, no driver math.

    Determinism: x = whole days since the epoch floor, y = integer
    cents, so every sum is EXACT int64 arithmetic; the closed-form
    slope/intercept/corr are then a fixed sequence of IEEE ops over
    identical integers in any engine. Rounded to 6 decimals.
    """
    x = F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast("long")
    y = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    staged = events.select(
        F.col(group_col).alias("grp"), x.alias("x"), y.alias("y")
    )
    agg = staged.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov_n = (F.col("sxy") * n - sx * sy).cast("double")
    var_x = (F.col("sxx") * n - sx * sx).cast("double")
    var_y = (F.col("syy") * n - sy * sy).cast("double")
    slope = cov_n / var_x
    r6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return agg.select(
        F.col("grp").alias(group_col),
        "n",
        r6(slope).alias("slope"),
        r6((sy.cast("double") - slope * sx.cast("double")) / n.cast("double")).alias(
            "intercept"
        ),
        r6(cov_n / F.sqrt(var_x * var_y)).alias("corr"),
    ).orderBy(group_col)
