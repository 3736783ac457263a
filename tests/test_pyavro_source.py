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


def test_read_aligns_columns_by_name_across_files(spark, tmp_path):
    """Regression (round-5 ADVICE): each container file decodes
    against its OWN writer schema; an append whose field order
    differs from the first file must not transpose values
    positionally, and a pre-evolution file missing a column
    surfaces NULL for it."""
    import os

    from local_lakehouse_spark.sources import avro_py

    d = str(tmp_path / "tbl")
    os.makedirs(d)
    # file A: (id, name) — this header fixes the read schema
    avro_py.write_container(
        os.path.join(d, "a-part-0.avro"),
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": ["null", "string"]},
            ],
        },
        iter([(1, "a"), (2, "b")]),
    )
    # file B: same fields, REVERSED order
    avro_py.write_container(
        os.path.join(d, "b-part-1.avro"),
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "name", "type": ["null", "string"]},
                {"name": "id", "type": "long"},
            ],
        },
        iter([("c", 3)]),
    )
    got = {
        (r.id, r.name)
        for r in spark.read.format("pyavro").load(d).collect()
    }
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    # file C: missing the name column entirely -> NULL
    avro_py.write_container(
        os.path.join(d, "c-part-2.avro"),
        {
            "type": "record",
            "name": "r",
            "fields": [{"name": "id", "type": "long"}],
        },
        iter([(4,)]),
    )
    got = {
        (r.id, r.name)
        for r in spark.read.format("pyavro").load(d).collect()
    }
    assert (4, None) in got and len(got) == 4
