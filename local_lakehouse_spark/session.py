"""SparkSession builder with scale-aware defaults.

Local test profile: ``local[N]`` with shuffle partitions sized to the
core count (not the 200 default — at sf0.1 that's 200 tiny tasks of
pure overhead). On a real cluster the same code runs with AQE
coalescing shuffle partitions to data volume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


# Confs the engine's correctness depends on, all runtime-settable, so
# they can be (re)applied to ANY SparkSession — including one built by
# an external harness without our builder. Keys:
# - nanosAsLong: if events.parquet stores TIMESTAMP(NANOS) (it has in
#   some driver rounds), Spark 4's vectorized reader rejects the read
#   (PARQUET_TYPE_ILLEGAL) unless the column is surfaced as long;
#   normalize_events_ts converts it back to a proper timestamp.
#   Harmless when the fixture stores MICROS (the conf never fires).
# - UTC timezone: timestamp rendering must match the DuckDB oracle.
# - Arrow: pandas UDF / applyInPandas batches go through Arrow.
# - fieldId.read: lets a scan schema carrying parquet.field.id
#   metadata resolve parquet columns by FOOTER FIELD ID instead of
#   name — delta_py attaches those ids only for tables with
#   delta.columnMapping.mode=id (the protocol's id-mode binding;
#   foreign id-mode footers need not match physical names). Inert
#   for every other read: schemas without the metadata keep name
#   resolution.
_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.fieldId.read.enabled": "true",
    "spark.sql.parquet.fieldId.write.enabled": "true",
    # VARIANT columns (Iceberg v3 / Spark 4): write the UNSHREDDED
    # variant group {metadata, value} without the parquet VARIANT
    # logical-type annotation — Spark 4.1's shredded+annotated
    # default writes footers this container's pyarrow cannot even
    # read_schema (unknown Thrift LogicalType), which would break
    # every driver-side footer probe (bounds, field ids, row
    # counts). Unshredded is the Iceberg spec's baseline encoding
    # and reads back as VariantType by field id.
    "spark.sql.variant.writeShredding.enabled": "false",
    "spark.sql.parquet.variant.annotateLogicalType.enabled": "false",
}


def harden_runtime(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable correctness confs to an existing
    session (idempotent, cheap). Every query entry point calls this so
    results do not depend on who built the SparkSession."""
    for key, value in _RUNTIME_CONFS.items():
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:
            spark.conf.set(key, value)
    return spark


# Magnitude thresholds that disambiguate the unit of an int64 epoch
# value. Geometric midpoints between adjacent units: any instant
# between ~1973 and ~5100 lands unambiguously in exactly one band
# (seconds ≈ 1.7e9, millis ≈ 1.7e12, micros ≈ 1.7e15, nanos ≈ 1.7e18
# for 2024).
_NANOS_MIN = 100_000_000_000_000_000  # 1e17
_MICROS_MIN = 100_000_000_000_000  # 1e14
_MILLIS_MIN = 100_000_000_000  # 1e11


def normalize_events_ts(df: "DataFrame", col: str = "ts") -> "DataFrame":
    """Unit-aware event-time normalization → TimestampType.

    The driver's events.parquet has stored ``ts`` differently across
    rounds: TIMESTAMP(NANOS) (round 1 — Spark surfaces it as int64
    *nanoseconds* under spark.sql.legacy.parquet.nanosAsLong) and
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 3 — Spark reads
    timestamp_ntz natively). Round 2 broke by hard-coding one unit, so
    this branches on what was actually read:

    - ``timestamp``      → already correct, untouched.
    - ``timestamp_ntz``  → wall-clock micros; the session timezone is
      pinned UTC (harden_runtime), so a plain cast preserves both the
      wall-clock AND the instant.
    - ``bigint``         → epoch integer of *some* unit. The unit is
      decided per-row by magnitude (see thresholds above) — a pure
      JVM CASE expression, no extra job, whole-stage codegen, and it
      keeps working if the fixture flips unit again. Nanos use
      integer DIV (no double round-trip → no precision loss at 1e18).

    Scale: a withColumn over the scan — pipelined into the first
    stage, no shuffle, no driver work.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get(col)
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    if dt == "bigint":
        c = f"`{col}`"
        micros = (
            f"CASE WHEN abs({c}) >= {_NANOS_MIN}L THEN {c} DIV 1000 "
            f"WHEN abs({c}) >= {_MICROS_MIN}L THEN {c} "
            f"WHEN abs({c}) >= {_MILLIS_MIN}L THEN {c} * 1000 "
            f"ELSE {c} * 1000000 END"
        )
        return df.withColumn(col, F.expr(f"timestamp_micros({micros})"))
    return df


def get_spark(
    app_name: str = "local-lakehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing, skew-join splitting, dynamic
        # broadcast — the knobs that make the same plan survive 100×.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic timestamps vs the DuckDB oracle (BASELINE.md).
        .config("spark.sql.session.timeZone", "UTC")
        # If the driver's events.parquet stores TIMESTAMP(NANOS) (some
        # rounds do), the vectorized reader rejects it; read as long and
        # convert explicitly (normalize_events_ts). No-op for MICROS.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow for any pandas UDF / toPandas path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Let Python DataSources (sources/synthetic.py) absorb
        # predicates and prune their input partitions at plan time.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Whole-stage codegen across a ~190-query inventory compiles
        # far more generated classes than the JVM's 240 MB default
        # code cache holds; eviction forces re-JIT of hot stages
        # mid-run (measured: x66 2x slower in-bench than isolated).
        # Standard Spark guidance for codegen-heavy workloads.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:ReservedCodeCacheSize=512m",
            ),
        )
        .config("spark.ui.enabled", "false")
    )
    # getOrCreate may return a PRE-EXISTING session (tests, harness) —
    # the builder confs above then never apply, so the runtime-settable
    # correctness confs are (re)applied explicitly every time.
    return harden_runtime(builder.getOrCreate())
