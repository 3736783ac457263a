"""Driver-fidelity tests for the Python DataSource registration path.

Round-9 driver failure class (CORRECTNESS_r09: y35/y37/y38/y39/y40):
the driver builds a BARE SparkSession — no package confs — and Spark 4
hard-fails any batch read through a Python DataSource whose reader
implements ``pushFilters`` when
``spark.sql.python.filterPushdown.enabled`` is false (its default).
``pyiceberg_source.register()`` did not flip the conf the way
``pydelta_source.register()`` did, so every batch ``format
('pyiceberg')`` read aborted with DATA_SOURCE_PUSHDOWN_DISABLED.
The local sweep could not see it because it built its session via
``session.get_spark``, which pre-sets the conf.

Coverage here:
- unit: the shared guard flips the conf on a default session and
  respects an explicit user setting (no JVM needed — stub session);
- unit: every ``register`` entry point routes through the guard;
- integration: a SUBPROCESS with a genuinely bare
  ``SparkSession.builder.getOrCreate()`` (fresh JVM, none of the
  pytest builder confs) runs a batch read against every registered
  source that has a ``pushFilters`` reader — pyiceberg, pydelta,
  synthetic_docs (prune unset AND set) — exactly what the driver does.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

from local_lakehouse_spark.sources.pushdown_conf import ensure_filter_pushdown

KEY = "spark.sql.python.filterPushdown.enabled"


class _StubConf:
    def __init__(self, store):
        self._store = store

    def set(self, k, v):
        self._store[k] = v


class _StubSession:
    """Mimics the three attributes ensure_filter_pushdown touches,
    parameterized on whether the conf was explicitly set at builder
    time or in the session state."""

    def __init__(self, builder_has_key=False, session_has_key=False):
        self.store: dict[str, str] = {}
        self.conf = _StubConf(self.store)
        self._builder_has_key = builder_has_key
        self._session_has_key = session_has_key

    @property
    def sparkContext(self):
        outer = self

        class _Ctx:
            def getConf(self):
                class _C:
                    def get(_s, k, default=None):
                        if k == KEY and outer._builder_has_key:
                            return "false"
                        return default

                return _C()

        return _Ctx()

    @property
    def _jsparkSession(self):
        outer = self

        class _J:
            def sessionState(self):
                class _S:
                    def conf(self):
                        class _C:
                            def contains(_s, k):
                                return (
                                    k == KEY and outer._session_has_key
                                )

                        return _C()

                return _S()

        return _J()


def test_guard_flips_on_default_session():
    s = _StubSession()
    ensure_filter_pushdown(s)
    assert s.store == {KEY: "true"}


def test_guard_respects_explicit_builder_setting():
    s = _StubSession(builder_has_key=True)
    ensure_filter_pushdown(s)
    assert s.store == {}


def test_guard_respects_explicit_session_setting():
    s = _StubSession(session_has_key=True)
    ensure_filter_pushdown(s)
    assert s.store == {}


@pytest.mark.parametrize(
    "register",
    [
        pytest.param(
            lambda s: __import__(
                "local_lakehouse_spark.sources.pyiceberg_source",
                fromlist=["register"],
            ).register(s),
            id="pyiceberg",
        ),
        pytest.param(
            lambda s: __import__(
                "local_lakehouse_spark.sources.pydelta_source",
                fromlist=["register"],
            ).register(s),
            id="pydelta",
        ),
        pytest.param(
            lambda s: __import__(
                "local_lakehouse_spark.sources.pyavro_source",
                fromlist=["register"],
            ).register(s),
            id="pyavro",
        ),
        pytest.param(
            lambda s: __import__(
                "local_lakehouse_spark.sources.synthetic",
                fromlist=["register_sources"],
            ).register_sources(s),
            id="synthetic",
        ),
    ],
)
def test_every_register_routes_through_guard(register):
    """Each register() must set the conf on a default-looking session
    BEFORE calling dataSource.register (the stub raises AttributeError
    at the register step — by then the conf must already be set)."""
    s = _StubSession()
    with pytest.raises(AttributeError):
        register(s)
    assert s.store.get(KEY) == "true"


_BARE_SESSION_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    # The driver's session: bare builder, default confs.
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    assert spark.conf.get(
        "spark.sql.python.filterPushdown.enabled"
    ) == "false", "premise: conf must default to false on a bare session"

    import pyarrow as pa
    from local_lakehouse_spark.sources import (
        iceberg_py, pyiceberg_source, pydelta_source,
    )
    from local_lakehouse_spark.sources.delta_py import write_delta
    from local_lakehouse_spark.sources.synthetic import register_sources

    df = spark.range(0, 100).selectExpr(
        "id AS k", "CAST(id % 7 AS INT) AS part", "id * 2 AS v"
    )

    # 1) pyiceberg batch read (the r9 failure, y35-shape)
    ice = sys.argv[1] + "/ice"
    iceberg_py.write_iceberg(
        spark, df, ice, mode="create", partition_by=["part"]
    )
    pyiceberg_source.register(spark)
    n = (
        spark.read.format("pyiceberg").load(ice)
        .filter("part = 3").count()
    )
    assert n == len([i for i in range(100) if i % 7 == 3]), n

    # 2) pydelta batch read (pushFilters reader)
    dl = sys.argv[1] + "/dl"
    write_delta(spark, df, dl, mode="overwrite")
    pydelta_source.register(spark)
    n = spark.read.format("pydelta").load(dl).filter("k < 10").count()
    assert n == 10, n

    # 3) synthetic_docs, prune unset AND set (its reader implements
    #    pushFilters unconditionally — the METHOD existing is gated)
    register_sources(spark)
    base = spark.read.format("synthetic_docs").option("n_docs", "50")
    assert base.load().filter("doc_id >= 40").count() == 10
    n = (
        spark.read.format("synthetic_docs")
        .option("n_docs", "50").option("pushdown", "true")
        .load().filter("doc_id >= 40").count()
    )
    assert n == 10, n
    print("BARE_SESSION_OK")
    """
)


@pytest.mark.slow
def test_bare_session_subprocess_reads(tmp_path):
    """End-to-end on a fresh JVM with driver-default confs: every
    pushFilters-bearing source must batch-read successfully. This is
    the test that would have failed at the round-9 commit."""
    env = dict(os.environ)
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _BARE_SESSION_SCRIPT, str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert "BARE_SESSION_OK" in proc.stdout
