"""DELTA format gates + AVRO fallback-source selection.

The environment ships neither delta-spark nor the spark-avro jar
(reference parity requires both formats —
/root/reference/uchelper/dataframe.py:197-226,414-425). DELTA remains
gated: precise UnsupportedOperationError on every dispatch path, with
each positive branch auto-activating if the package ever appears.
AVRO is now EXECUTABLE regardless: io.py probes for the JVM source
(preferred when present — block-splittable scans) and otherwise uses
the pure-Python object-container codec (sources/avro_py.py,
tests/test_avro_codec.py); the tests here pin that selection logic.

Vendored-activation attempt (round 3), documented so the finding is
reproducible:
  - no connector jars anywhere on disk: ``find / -name '*delta*jar'``
    and ``... -name 'spark-avro*'`` return nothing (pyspark/jars has
    only avro-1.12.1 core, NOT the spark-avro DataSource);
  - no python package: ``importlib.util.find_spec('delta')`` → None;
  - no ivy cache: ``~/.ivy2`` absent;
  - no network: DNS resolution of repo1.maven.org fails (Errno -2),
    so ``spark.jars.packages`` cannot fetch and pip cannot install.
Activation is therefore impossible in-sandbox. The delta-specific
*semantics* (replaceWhere, partition_filters, schema modes, MERGE,
time travel) are instead pinned parquet-natively by
tests/test_dataframes.py (test_replace_where_reference_sequence,
test_partition_filters_reference_sequence, the evolution matrix) and
tests/test_merge.py, mirroring the reference's delta test scenarios
row-for-row.
"""

from __future__ import annotations

import pytest

from local_lakehouse_spark import UnsupportedOperationError
from local_lakehouse_spark.io import HAVE_DELTA, read_format_path
from local_lakehouse_spark.models import FileType

from conftest import SF_DIR


def _have_avro(spark) -> bool:
    try:
        spark.read.format("avro").load(f"{SF_DIR}/region.parquet")
        return True
    except Exception as exc:
        # jar missing → FAILED_FIND_DATA_SOURCE / ClassNotFound;
        # anything else (e.g. wrong-format parse error) means the
        # source EXISTS.
        return "Failed to find" not in str(exc) and "ClassNotFound" not in str(exc)


# -- AVRO --------------------------------------------------------------------
# Positive coverage lives in tests/test_avro_codec.py (codec + client
# lifecycle); here we pin the JVM-vs-python source selection.


def test_avro_source_selection_matches_probe(spark):
    from local_lakehouse_spark.io import _have_jvm_avro

    assert _have_jvm_avro(spark) == _have_avro(spark)


def test_avro_always_executable(unity, random_df, tmp_path):
    """AVRO works with or without the jar — no gate anymore."""
    df = random_df(3)
    unity.create_as_table(
        df, "unity", "default", "av_gate", file_type="avro",
        location=f"file://{tmp_path}/t.avro",
    )
    assert unity.read_table("unity", "default", "av_gate").count() == 3


def test_avro_missing_file_raises_not_found(spark, tmp_path):
    with pytest.raises(Exception, match="[Nn]o.*[Aa]vro|PATH_NOT_FOUND"):
        read_format_path(spark, FileType.AVRO, str(tmp_path / "x.avro"))


# -- DELTA -------------------------------------------------------------------


def test_delta_read_gate(spark, tmp_path):
    if HAVE_DELTA:
        pytest.skip("delta-spark available — positive path covered below")
    with pytest.raises(UnsupportedOperationError, match="delta-spark"):
        read_format_path(spark, FileType.DELTA, str(tmp_path / "d"))


def test_delta_write_and_helpers_gate(unity, random_df, tmp_path):
    df = random_df(3)
    loc = f"file://{tmp_path}/d"
    if HAVE_DELTA:
        unity.create_as_table(
            df, "unity", "default", "dt", file_type="delta", location=loc
        )
        assert unity.read_table("unity", "default", "dt").count() == 3
        assert unity.get_delta_table("unity", "default", "dt") is not None
        unity.sync_delta_properties("unity", "default", "dt")
    else:
        with pytest.raises(UnsupportedOperationError):
            unity.create_as_table(
                df, "unity", "default", "dt", file_type="delta", location=loc
            )


def test_delta_table_helper_requires_delta_format(unity, random_df, tmp_path):
    """get_delta_table on a non-DELTA table raises regardless of the
    package (parity /root/reference/uchelper/client.py:323-330)."""
    unity.create_as_table(
        random_df(2), "unity", "default", "pq",
        location=f"file://{tmp_path}/pq",
    )
    with pytest.raises(UnsupportedOperationError, match="not a DELTA"):
        unity.get_delta_table("unity", "default", "pq")


def test_delta_merge_gate(unity, random_df, tmp_path):
    """MERGE on a DELTA-typed table needs delta-spark; the error comes
    from the merge entry, not a crash deeper in."""
    if HAVE_DELTA:
        pytest.skip("delta-spark available")
    from local_lakehouse_spark.merge import merge_table
    from local_lakehouse_spark.models import Column, DataType, Table, TableType

    tbl = Table(
        name="d", catalog_name="unity", schema_name="default",
        table_type=TableType.EXTERNAL, file_type=FileType.DELTA,
        columns=[
            Column(name="id", data_type=DataType.LONG, position=0, nullable=False),
        ],
        storage_location=f"file://{tmp_path}/d",
    )
    src = unity._require_spark().range(1).selectExpr("id")
    with pytest.raises(UnsupportedOperationError, match="delta"):
        merge_table(unity._require_spark(), tbl, src, condition="s.id = t.id")
