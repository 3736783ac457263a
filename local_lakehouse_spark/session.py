"""SparkSession builder with scale-aware defaults.

Local test profile: ``local[N]`` with shuffle partitions sized to the
core count (not the 200 default — at sf0.1 that's 200 tiny tasks of
pure overhead). On a real cluster the same code runs with AQE
coalescing shuffle partitions to data volume.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# Confs the engine's correctness depends on, all runtime-settable, so
# they can be (re)applied to ANY SparkSession — including one built by
# an external harness without our builder. Keys:
# - nanosAsLong: testdata events.parquet stores TIMESTAMP(NANOS) which
#   Spark 4's vectorized reader rejects (PARQUET_TYPE_ILLEGAL) unless
#   read as long (we convert back to timestamp explicitly).
# - UTC timezone: timestamp rendering must match the DuckDB oracle.
# - Arrow: pandas UDF / applyInPandas batches go through Arrow.
_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
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
        # The driver's events.parquet stores TIMESTAMP(NANOS), which the
        # vectorized reader rejects; read as long and convert explicitly
        # (queries.events_table does the nanos→timestamp conversion).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow for any pandas UDF / toPandas path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Let Python DataSources (sources/synthetic.py) absorb
        # predicates and prune their input partitions at plan time.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
