"""Deterministic sampling operators for training-data mixing.

A pretraining pipeline needs REPRODUCIBLE samples: re-running the
job, on any cluster size, must admit exactly the same rows — so
`rand()` (per-task RNG, partition-dependent) is out. These operators
derive the admission decision from a cryptographic hash of the row
key: portable, seed-able via salt, and expressible in any engine
(the DuckDB oracle runs the identical md5-prefix comparison).

Scale shape: pure map-side filters — no shuffle, no driver round-trip,
admission decided row-locally inside the scan stage. Changing the
fraction only moves the hex threshold, so samples are NESTED
(a 10% sample is a subset of the 20% sample — handy for scaling-law
runs over the same corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 8 hex chars = 32 bits of the md5 — plenty of resolution for any
# practical sampling rate, and a short lexicographic compare.
_HEX_DIGITS = 8
_SPACE = 16**_HEX_DIGITS


def _bucket(id_col: Column, salt: str) -> Column:
    """Lowercase 8-hex-char bucket key in ['00000000', 'ffffffff']."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, _HEX_DIGITS
    )


def _threshold(fraction: float) -> str:
    """Hex threshold T such that P[bucket < T] = fraction.

    fraction ≥ 1 → 'g' (sorts above every hex digit, so every 8-char
    lowercase-hex bucket satisfies bucket < T).
    """
    f = min(max(fraction, 0.0), 1.0)
    if f >= 1.0:
        return "g"
    return format(int(f * _SPACE), "08x")


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on ``id_col``.

    Every row with md5(salt || id)[:8] < hex(fraction · 16^8) is kept:
    the same rows survive on every run, every partitioning, every
    engine.
    """
    if fraction >= 1.0:
        return df
    return df.filter(_bucket(F.col(id_col), salt) < F.lit(_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive
    (e.g. keep 50% of English docs, 10% of each minor language).

    One CASE expression picks the stratum's hex threshold; the filter
    stays a scan-stage predicate (no shuffle, no per-stratum passes).
    """
    thr: Column = F.lit(_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(_threshold(frac))
        ).otherwise(thr)
    return df.filter(_bucket(F.col(id_col), salt) < thr)


def cap_per_group(
    df: DataFrame, id_col: str, group_col: str, n: int, salt: str = ""
) -> DataFrame:
    """Keep at most ``n`` rows per group, chosen by hash order — the
    source-capping step of corpus mixing ("no more than N docs per
    domain"), reproducible across runs and cluster sizes.

    Hash-then-rank ≡ a uniform random cap, but deterministic. One
    shuffle on the group key; the per-group sort is bounded by group
    size (cap groups are usually ≪ a partition). Heavily skewed
    groups (one domain = half the corpus) should be pre-split by
    salting — see operators/skew.py.
    """
    win = Window.partitionBy(group_col).orderBy(
        _bucket(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    total_rows: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic multi-source mixture: draw ~``total_rows`` rows
    with per-source proportions ``weights`` (the corpus-mixing step of
    a training-data pipeline — "40% web, 40% code, 20% books").

    Per-source keep-fraction = min(1, target_s / count_s) with
    target_s = total_rows · w_s / Σw, realized as the same
    md5-threshold Bernoulli filter as hash_sample — so the selected
    set is identical across runs, partitionings, and engines, and the
    whole decision stays a scan-stage predicate after one tiny
    broadcast join of per-source thresholds. Sources absent from
    ``weights`` are dropped. Realized counts are Binomial around the
    target (exact-count variants are what cap_per_group is for).
    """
    wsum = sum(weights.values())
    targets = [(s, total_rows * w / wsum) for s, w in sorted(weights.items())]
    counts = (
        df.groupBy(F.col(source_col).alias("__src"))
        .agg(F.count("*").alias("__n"))
    )
    target_col: Column = F.lit(None).cast("double")
    for s, tgt in targets:
        target_col = F.when(F.col("__src") == s, F.lit(float(tgt))).otherwise(
            target_col
        )
    # guard the null case explicitly: least() SKIPS nulls, so
    # least(1.0, NULL) is 1.0 and unweighted sources would pass whole
    frac = F.when(
        target_col.isNull(), F.lit(None).cast("double")
    ).otherwise(F.least(F.lit(1.0), target_col / F.col("__n")))
    # name-based equi-join: `counts` shares lineage with df, so an
    # expression join on df[source_col] is ambiguous (both sides own
    # the attribute); joining on the column NAME sidesteps that.
    thresholds = counts.select(
        F.col("__src").alias(source_col),
        F.when(frac >= 1.0, F.lit("g"))
        .otherwise(
            F.format_string(
                "%08x", F.floor(frac * F.lit(float(_SPACE))).cast("long")
            )
        )
        .alias("__thr"),
    ).filter(F.col("__thr").isNotNull())
    return (
        df.join(F.broadcast(thresholds), on=source_col)
        .filter(_bucket(F.col(id_col), salt) < F.col("__thr"))
        .drop("__thr")
    )


def weighted_sample_topk(
    df: DataFrame, id_col: str, weight_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep k
    rows with inclusion probability proportional to ``weight_col``
    (importance-weighted corpus selection — e.g. sample documents
    ∝ length or quality score, reproducibly).

    A-ES exponential ranking (Efraimidis & Spirakis 2006, public):
    each row draws u ∈ (0,1] and ranks by u^(1/w); the top-k ranks
    form an exact weighted sample without replacement. We rank by the
    monotone-equivalent ln(u)/w (no pow), with u derived from the
    48-bit md5 integer — the same engine-portable uniform the sketch
    family uses — so every run, partitioning, and engine draws the
    SAME sample.

    Scale: the ranking key is a scan-stage expression; top-k is
    Spark's distributed TakeOrdered (per-partition heaps → merge of k
    candidates per partition), never a full sort.

    A-ES requires strictly positive weights: NULL / zero / negative
    weights would yield NULL, +inf, or sign-flipped ranking keys that
    silently win or lose the sample, so such rows raise instead
    (mirroring the m_bits validation in bloomjoin.py).
    """
    from .sketches import _md5_u48

    w = F.col(weight_col).cast("double")
    u = (
        _md5_u48(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
        + 1
    ) / F.lit(float(1 << 48))
    # raise_error is lazy inside when(): evaluated only on bad rows.
    checked_w = F.when(
        w.isNull() | (w <= 0),
        F.raise_error(
            F.concat(
                F.lit(
                    f"weighted_sample_topk: {weight_col} must be > 0 "
                    "and non-NULL, got "
                ),
                F.coalesce(w.cast("string"), F.lit("NULL")),
            )
        ).cast("double"),
    ).otherwise(w)
    key = F.log(u) / checked_w
    return (
        df.withColumn("__aes_key", key)
        .orderBy(F.desc("__aes_key"), F.col(id_col))
        .limit(k)
        .drop("__aes_key")
    )


def contiguous_ids(
    df: DataFrame, order_col: str, out_col: str = "row_id"
) -> DataFrame:
    """Contiguous 1..N ids in ``order_col`` order WITHOUT a global
    single-task sort — the sample-numbering / sharding step of a
    training-data build (example ids, shard offsets).

    The naive ``row_number() OVER (ORDER BY ...)`` funnels the whole
    table through ONE partition. This is the scalable classic
    instead: range-partition by the order column, rank locally per
    partition, then add broadcast per-partition offsets (a prefix sum
    over #partitions counts — the only single-task step, sized
    O(partitions)). Same two-phase scan as operators/pareto.py.

    Ties in ``order_col`` break by the column's partition-internal
    sort stability; pass a unique key (the usual case: doc_id) for a
    fully deterministic assignment.
    """
    parts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    d = df.repartitionByRange(parts, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(order_col)
    d = d.withColumn("__local_rn", F.row_number().over(w_local))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        d.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__offset", F.coalesce(F.sum("__n").over(w_off), F.lit(0)))
        .select("__pid", "__offset")
    )
    return (
        d.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__local_rn") + F.col("__offset")).cast("bigint"))
        .drop("__pid", "__local_rn", "__offset")
    )
