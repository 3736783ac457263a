"""Skew mitigation: salted joins and two-phase salted aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime by splitting oversized partitions. These operators are the
explicit, plan-level variants for the cases AQE can't fix:

- ``salted_join``: a hot join key whose single hash partition
  overwhelms one executor. The salt spreads each key over
  ``n_salts`` partitions; the small side is replicated ``n_salts``×
  (cheap when the small side is dimension-sized — it was going to be
  broadcast or shuffled anyway).
- ``salted_agg``: a hot group key in a high-cardinality aggregate.
  Phase 1 aggregates on (key, salt) — spreading the hot key's rows —
  phase 2 re-aggregates the ≤ n_salts partials per key. Only works
  for decomposable aggregates (sum/count/min/max → re-agg; avg →
  sum+count then divide).

Both are deterministic: the salt is a hash of a caller-named unique
column, never rand() — repeated runs produce identical plans and
results (required by the driver's hash-compare correctness gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side salted and the RIGHT side
    replicated — semantically identical to ``left.join(right, on,
    how)`` for inner/left joins.

    ``salt_src`` names a left-side column whose hash spreads rows of
    the same join key across salts (use a unique id; using the join
    key itself would put every copy of a hot key in the same salt and
    defeat the purpose). The right side is exploded over all salts,
    so each (key, salt) bucket finds its match.

    Scale note: shuffle volume becomes |L| + n_salts·|R|; choose
    n_salts ≈ (hot-key row count) / (target partition row count).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r}"
        )
    l_salted = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    )
    r_replicated = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)])),
    )
    return l_salted.join(r_replicated, [on, "__salt"], how).drop("__salt")


def salted_agg(
    df: DataFrame,
    group_col: str,
    salt_src: str,
    aggs: dict[str, str],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation over a skewed group key.

    ``aggs`` maps output column name → "fn(col)" with fn in
    sum/count/min/max. Phase 1 computes partials per (key, salt);
    phase 2 merges partials per key (count partials merge with SUM).
    Result is identical to a direct groupBy for these decomposable
    aggregates.

    (Spark's hash aggregate already does map-side partial aggregation,
    which handles skew for aggregation-after-scan; salting matters
    when the input arrives ALREADY partitioned by the hot key — e.g.
    aggregating the output of a join on that key — so the partial agg
    itself is single-partition-bound.)
    """
    import re

    parsed: list[tuple[str, str, str]] = []
    for out_name, expr in aggs.items():
        m = re.fullmatch(r"(sum|count|min|max)\((\w+|\*)\)", expr.strip())
        if not m:
            raise ValueError(
                f"unsupported agg {expr!r} (need sum/count/min/max)"
            )
        parsed.append((out_name, m.group(1), m.group(2)))

    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    )
    phase1 = salted.groupBy(group_col, "__salt").agg(
        *[
            (
                F.count("*") if col == "*" else getattr(F, fn)(col)
            ).alias(f"__p_{out}")
            for out, fn, col in parsed
        ]
    )
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    return phase1.groupBy(group_col).agg(
        *[
            merge_fn[fn](f"__p_{out}").alias(out)
            for out, fn, col in parsed
        ]
    )
