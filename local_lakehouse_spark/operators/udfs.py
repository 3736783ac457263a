"""Pandas UDF surface — the sanctioned Python escape hatches.

The reference exposes no UDF registration at all (SURVEY §2.C); these
operators document the two Spark shapes a pipeline actually needs and
their cost model:

- scalar ``pandas_udf``: Arrow-batched, vectorized over numpy — the
  ONLY acceptable per-row Python (10-100× over row-at-a-time UDFs).
  Still ~5× slower than staying JVM-side; use only when the logic
  can't be expressed in pyspark.sql.functions.
- grouped ``applyInPandas``: per-group pandas frames — for group
  logic that needs a real dataframe library (model scoring, scipy).
  Shuffles the full group to one task: groups must fit in executor
  memory (the 100 TB guard is the grouping key's cardinality/size,
  not the table's).

Both examples use pure IEEE-754 arithmetic in a fixed evaluation
order, so the DuckDB oracle matches bit-for-bit — demonstrating that
even Python-side operators can be held to the exact-match gate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _poly_score_udf():
    # Built lazily: @pandas_udf("<ddl>") parses the return type via
    # the ACTIVE SparkSession, so a module-level decorator would make
    # `import ...operators.udfs` crash before a session exists.
    @pandas_udf("double")
    def _poly_score(v: pd.Series) -> pd.Series:
        # fixed-order IEEE arithmetic: (v*v)*0.5 + v*0.25 + 1.0
        return (v * v) * 0.5 + v * 0.25 + 1.0

    return _poly_score


def scalar_score(
    df: DataFrame, id_col: str, value_col: str
) -> DataFrame:
    """(id, score) — Arrow-vectorized scalar pandas UDF."""
    return df.select(
        F.col(id_col).alias("id"),
        _poly_score_udf()(F.col(value_col).cast("double")).alias("score"),
    )


def minmax_normalize(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """(group, id, norm) — per-group min-max normalization via
    applyInPandas; norm = (v - min) / (max - min), NULL for
    single-valued groups (min == max)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["__v"]
        lo, hi = v.min(), v.max()
        norm = (v - lo) / (hi - lo) if hi > lo else pd.Series(
            [None] * len(v), dtype="float64"
        )
        return pd.DataFrame(
            {"group": pdf["__g"], "id": pdf["__id"], "norm": norm}
        )

    prepared = df.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("__id"),
        F.col(value_col).cast("double").alias("__v"),
    )
    return prepared.groupBy("__g").applyInPandas(
        kernel, "group string, id bigint, norm double"
    )
