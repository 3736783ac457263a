"""Correctness must not depend on who built the SparkSession.

Round-1 driver failure mode (CORRECTNESS_r01: q05, q32): the external
harness builds its own SparkSession without
spark.sql.legacy.parquet.nanosAsLong, and events.parquet stores
TIMESTAMP(NANOS) which Spark 4's vectorized reader rejects. Every
query entry point now applies the runtime-settable confs itself
(session.harden_runtime), so a conf-less session works.

These tests simulate the driver: a newSession() with the critical
confs explicitly unset/perturbed, then the query functions must still
run and produce the same result as the hardened session.
"""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import AnalysisException

from local_lakehouse_spark import queries as Q
from local_lakehouse_spark.session import _RUNTIME_CONFS, harden_runtime

from conftest import SF_DIR


@pytest.fixture()
def bare_session(spark):
    """A session sharing the JVM but with its own SQLConf, stripped of
    every conf harden_runtime is responsible for (simulates the
    driver's SparkSession.builder.getOrCreate())."""
    s = spark.newSession()
    # conf.unset would fall back to the builder-time SparkConf (which
    # has our values) — explicitly set the Spark DEFAULTS instead,
    # which is what a plain builder.getOrCreate() session would have.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    # Perturb the timezone the way a non-UTC host would.
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    s.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    assert _RUNTIME_CONFS.keys() == {
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.session.timeZone",
        "spark.sql.execution.arrow.pyspark.enabled",
    }, "new runtime conf added — perturb it here too"
    return s


def test_bare_session_rejects_nanos_read(bare_session):
    """Precondition: without the conf the raw read really fails —
    otherwise this whole module tests nothing."""
    with pytest.raises(AnalysisException, match="PARQUET_TYPE_ILLEGAL"):
        bare_session.read.parquet(f"{SF_DIR}/events.parquet").schema


def test_q05_on_bare_session(bare_session, spark):
    got = Q.q05(bare_session, SF_DIR).collect()
    want = Q.q05(harden_runtime(spark), SF_DIR).collect()
    assert got == want
    assert (
        bare_session.conf.get("spark.sql.legacy.parquet.nanosAsLong")
        == "true"
    )
    assert bare_session.conf.get("spark.sql.session.timeZone") == "UTC"


def test_q32_on_bare_session(bare_session, spark):
    got = Q.q32(bare_session, SF_DIR).collect()
    want = Q.q32(spark, SF_DIR).collect()
    assert got == want


def test_events_table_on_bare_session(bare_session):
    df = Q.events_table(bare_session, SF_DIR)
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


def test_date_query_timezone_independent(bare_session, spark):
    """q26 groups by date parts — its hash must not move with the
    host timezone."""
    got = Q.q26(bare_session, SF_DIR).collect()
    want = Q.q26(spark, SF_DIR).collect()
    assert got == want


def test_streaming_read_on_bare_session(bare_session, tmp_path):
    import os

    from local_lakehouse_spark.streaming.windows import read_events_stream

    stage = tmp_path / "events_stage"
    stage.mkdir()
    os.symlink(
        os.path.abspath(f"{SF_DIR}/events.parquet"),
        stage / "events.parquet",
    )
    stream = read_events_stream(bare_session, str(stage))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"
