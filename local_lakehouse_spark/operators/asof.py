"""As-of join — match each left row to the latest right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB does — which provides the
oracle). The naive formulation (equi-join on key + time filter + pick
max) explodes to |L|·|R| per key before filtering. This implementation
is the merge-based union trick, the scalable pattern:

    1. union left probes and right states into one stream tagged by
       side, with right rows carrying their payload;
    2. one window sort per key over the union, ordered by (time,
       side-priority) — right rows sort before probes at equal time;
    3. last_value(payload, ignorenulls) propagates the most recent
       right payload forward onto each probe row.

Cost: ONE shuffle of |L|+|R| rows on the key — same asymptotics as a
sort-merge join, no pair blow-up, skew handled by AQE. This is the
composition-of-existing-ops path (SURVEY custom-operator rule (a));
no Pandas UDF needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    direction: str = "backward",
    state_tiebreak: str | None = None,
) -> DataFrame:
    """Left rows + latest-right payload columns (NULL when no right row
    precedes). ``direction='backward'`` matches right_time <= left_time
    (the DuckDB ``ASOF JOIN ... ON l.t >= r.t`` semantics);
    ``'forward'`` matches the earliest right_time >= left_time.

    ``state_tiebreak`` (a payload column name) makes ties among right
    rows at the SAME (key, time) deterministic without a separate
    dedup pass: state rows at equal time are ordered by the tiebreak
    ascending inside the one as-of window, so ``backward`` resolves
    equal-time ties to the MAX tiebreak row and ``forward`` to the
    MIN — identical to deduplicating the right side to that row first
    (r12: folding the dedup into the window ordering removes the
    dedup's own exchange + sort + window pass; all payload columns
    come from the same winning row because ``last/first(ignorenulls)``
    skip probe rows' all-NULL payloads, and the probe/state flag
    orders before the tiebreak so probe rows never interleave).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    if state_tiebreak is not None and state_tiebreak not in payload_cols:
        raise ValueError(
            f"state_tiebreak {state_tiebreak!r} must be one of payload_cols"
        )

    l_tagged = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_time).alias("__time"),
        F.lit(1).alias("__is_probe"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__p_{c}") for c in payload_cols],
        F.struct(*left.columns).alias("__left_row"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_time).alias("__time"),
        F.lit(0).alias("__is_probe"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
        F.lit(None)
        .cast(l_tagged.schema["__left_row"].dataType)
        .alias("__left_row"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    tiebreak = (
        [F.asc(f"__p_{state_tiebreak}")] if state_tiebreak is not None else []
    )
    if direction == "backward":
        # state rows sort before probes at equal time → <= semantics
        w = (
            Window.partitionBy("__key")
            .orderBy(F.asc("__time"), F.asc("__is_probe"), *tiebreak)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = [
            F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ]
    else:
        w = (
            Window.partitionBy("__key")
            .orderBy(F.asc("__time"), F.desc("__is_probe"), *tiebreak)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        picked = [
            F.first(F.col(f"__p_{c}"), ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ]

    out = (
        unioned.select("__is_probe", "__left_row", *picked)
        .filter(F.col("__is_probe") == 1)
        .select(
            *[F.col(f"__left_row.{c}").alias(c) for c in
              [f.name for f in unioned.schema["__left_row"].dataType.fields]],
            *payload_cols,
        )
    )
    return out
