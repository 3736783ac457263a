"""pyavro Python Data Source: header-derived schema, per-file
partition reads, distributed writes, append/overwrite modes, and the
full supported type matrix round-tripping through format dispatch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_lakehouse_spark.sources import pyavro_source
from local_lakehouse_spark.sources.pyavro_source import PyAvroDataSource


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    pyavro_source.register(spark)


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "avro_tbl")


def test_roundtrip_with_nulls(spark, tbl):
    df = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b", None, False), (3, None, 2.5, None)],
        "id long, s string, x double, b boolean",
    )
    df.write.format("pyavro").mode("append").save(tbl)
    got = spark.read.format("pyavro").load(tbl)
    assert got.schema.simpleString() == df.schema.simpleString()
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in df.collect()}


def test_append_and_overwrite(spark, tbl):
    spark.range(10).select("id").write.format("pyavro").mode("append").save(tbl)
    spark.range(10, 15).select("id").write.format("pyavro").mode(
        "append"
    ).save(tbl)
    assert spark.read.format("pyavro").load(tbl).count() == 15
    spark.range(3).select("id").write.format("pyavro").mode("overwrite").save(
        tbl
    )
    assert spark.read.format("pyavro").load(tbl).count() == 3


def test_type_matrix_roundtrip(spark, tbl):
    """timestamp-micros, date, decimal, int — the Avro logical types
    the codec maps — survive the format-dispatch path bit-exactly."""
    df = spark.sql(
        "SELECT TIMESTAMP'2024-01-02 03:04:05.123456' AS ts, "
        "DATE'2024-05-06' AS d, CAST(1.23 AS DECIMAL(10,2)) AS dec, "
        "CAST(42 AS INT) AS i, CAST(7 AS SMALLINT) AS si"
    )
    df.write.format("pyavro").mode("append").save(tbl)
    got = spark.read.format("pyavro").load(tbl)
    row = got.collect()[0]
    assert str(row.ts) == "2024-01-02 03:04:05.123456"
    assert str(row.d) == "2024-05-06"
    assert str(row.dec) == "1.23"
    assert row.i == 42


def test_parallel_write_one_file_per_task(spark, tbl):
    import os

    spark.range(1000).repartition(4).write.format("pyavro").mode(
        "append"
    ).save(tbl)
    files = [f for f in os.listdir(tbl) if f.endswith(".avro")]
    assert len(files) == 4  # one container per task
    assert spark.read.format("pyavro").load(tbl).count() == 1000


def test_interop_with_avro_py_reader(spark, tbl):
    """Files written via the format API decode identically through
    the existing read_avro (binaryFile+mapInPandas) path, and vice
    versa — one codec, two dispatch surfaces."""
    from local_lakehouse_spark.sources.avro_py import read_avro, write_avro_dir

    df = spark.range(50).select("id", (F.col("id") * 3).alias("v"))
    df.write.format("pyavro").mode("append").save(tbl)
    via_fn = read_avro(spark, tbl)
    assert {tuple(r) for r in via_fn.collect()} == {
        tuple(r) for r in df.collect()
    }
    tbl2 = tbl + "_fn"
    write_avro_dir(df, tbl2)
    via_fmt = spark.read.format("pyavro").load(tbl2)
    assert {tuple(r) for r in via_fmt.collect()} == {
        tuple(r) for r in df.collect()
    }


def test_datasource_name():
    assert PyAvroDataSource.name() == "pyavro"
