"""Multi-dimensional data layout (Z-order clustering) for file
skipping.

Parquet/Delta readers prune files by per-file min/max statistics. A
linear sort gives perfect pruning on the leading sort key and none on
any other column. Interleaving the bits of several keys (the Z-order /
Morton curve) makes every clustered column's values locally dense, so
range/point predicates on ANY of the clustered columns skip most
files — the layout trick behind Delta's OPTIMIZE ZORDER BY.

Built here from scratch with plain column expressions:

1. one tiny aggregate computes each column's (min, max) — two scalars
   per column to the driver, never data;
2. each value is scaled to a ``bits``-wide integer rank by linear
   min/max scaling (documented skew caveat below);
3. the ranks' bits are interleaved with shift/and/or arithmetic —
   whole-stage codegen, no UDF;
4. ``repartitionByRange`` on the z-key splits the curve into
   ``num_files`` contiguous segments (range sampling handles the
   z-value distribution), and ``sortWithinPartitions`` orders rows
   inside each file.

Scale shape: one extra scan for min/max (or pass known bounds), one
range shuffle — the same cost profile as a global sort, which any
clustering rewrite pays. Linear scaling is rank-free (no global
window); heavily skewed columns get fewer effective bits — for those,
pre-transform (e.g. log) or pass explicit ``bounds``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def _as_double(df: DataFrame, name: str) -> Column:
    """Numeric view of a clustered column (dates/timestamps → epoch
    seconds; DATE can't cast straight to double under ANSI mode)."""
    col = F.col(name)
    if dict(df.dtypes).get(name) == "date":
        col = col.cast("timestamp")
    return col.cast("double")


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = DEFAULT_BITS,
    bounds: Optional[dict[str, tuple[float, float]]] = None,
) -> Column:
    """Morton (bit-interleaved) key over ``cols`` as a column
    expression. ``bits`` per dimension; len(cols) * bits must fit in
    63 bits. NULLs rank lowest (bucket 0).
    """
    if len(cols) * bits > 63:
        raise ValueError("len(cols) * bits must be <= 63")
    bounds = dict(bounds or {})
    missing = [c for c in cols if c not in bounds]
    if missing:
        row = df.select(
            *[F.min(_as_double(df, c)).alias(f"mn_{c}") for c in missing],
            *[F.max(_as_double(df, c)).alias(f"mx_{c}") for c in missing],
        ).first()
        for c in missing:
            bounds[c] = (row[f"mn_{c}"], row[f"mx_{c}"])

    top = (1 << bits) - 1
    ranks: list[Column] = []
    for c in cols:
        mn, mx = bounds[c]
        if mn is None or mx is None or mx <= mn:
            ranks.append(F.lit(0).cast("bigint"))
            continue
        scaled = F.floor(
            (_as_double(df, c) - F.lit(float(mn)))
            / F.lit(float(mx) - float(mn))
            * top
        )
        ranks.append(
            F.coalesce(
                F.greatest(F.lit(0), F.least(F.lit(top), scaled)), F.lit(0)
            ).cast("bigint")
        )

    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            z = z + bit * F.lit(1 << (i * len(ranks) + j))
    return z


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    num_files: int,
    bits: int = DEFAULT_BITS,
    bounds: Optional[dict[str, tuple[float, float]]] = None,
) -> DataFrame:
    """Rows clustered along the Z-curve: ready to write as
    ``num_files`` files whose min/max stats are tight on every
    clustered column.
    """
    z = zorder_key(df, cols, bits=bits, bounds=bounds)
    return (
        df.withColumn("__zorder", z)
        .repartitionByRange(num_files, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
    )


def linear_layout(df: DataFrame, col: str, num_files: int) -> DataFrame:
    """Single-key range layout (the baseline Z-order is compared to)."""
    return df.repartitionByRange(num_files, col).sortWithinPartitions(col)
