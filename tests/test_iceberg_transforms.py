"""Iceberg partition TRANSFORMS (sources/iceberg_transforms.py +
the write/prune paths in sources/iceberg_py.py): murmur3 bucket
hashing against the spec's published Appendix B test vectors, the
vectorized writer path against the scalar oracle, transform
semantics (floored truncate, epoch-relative temporal ordinals),
transform-aware pruning logic, and a Spark round-trip over a
bucket + days + truncate partitioned table.

Reference parity: the reference delegates Iceberg partitioning to
its table-format library (reference uchelper/dataframe.py:198-199);
this repo implements the public spec's transform + hash rules
directly.
"""

from __future__ import annotations

import datetime as dt
import struct
import uuid
from decimal import Decimal

import pytest

from local_lakehouse_spark.exceptions import UnsupportedOperationError
from local_lakehouse_spark.sources import iceberg_py
from local_lakehouse_spark.sources import iceberg_transforms as tr


# --------------------------------------------------------------------
# Appendix B: published hash test vectors (one per bucketable type)
# --------------------------------------------------------------------

_TZ8 = dt.timezone(dt.timedelta(hours=-8))

SPEC_VECTORS = [
    (34, "int", 2017239379),
    (34, "long", 2017239379),
    (Decimal("14.20"), "decimal(9,2)", -500754589),
    (dt.date(2017, 11, 16), "date", -653330422),
    ((22 * 3600 + 31 * 60 + 8) * 1_000_000, "time", -662762989),
    (dt.datetime(2017, 11, 16, 22, 31, 8), "timestamp", -2047944441),
    (
        dt.datetime(2017, 11, 16, 14, 31, 8, tzinfo=_TZ8),
        "timestamptz",
        -2047944441,
    ),
    ("iceberg", "string", 1210000089),
    (
        uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7"),
        "uuid",
        1488055340,
    ),
    (b"\x00\x01\x02\x03", "binary", -188683207),
]


@pytest.mark.parametrize("value,ice_type,expected", SPEC_VECTORS)
def test_bucket_hash_spec_vectors(value, ice_type, expected):
    assert tr.bucket_hash(value, ice_type) == expected


def test_vectorized_murmur3_matches_scalar():
    import numpy as np

    rng = np.random.default_rng(7)
    vals = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64)
    vec = tr._mm3_long_vec(vals)
    for v, h in zip(vals.tolist(), vec.tolist()):
        assert tr.murmur3_32(struct.pack("<q", v)) == h


def test_bucket_refuses_float_double_boolean():
    for t in ("float", "double", "boolean"):
        with pytest.raises(UnsupportedOperationError):
            tr.bucket_hash(1.0, t)
        with pytest.raises(UnsupportedOperationError):
            tr.validate("bucket[4]", t)


# --------------------------------------------------------------------
# transform semantics
# --------------------------------------------------------------------


def test_parse_partition_by_shapes():
    assert tr.parse_partition_by("user_id") == ("user_id", "identity")
    assert tr.parse_partition_by("bucket(16, user_id)") == (
        "user_id",
        "bucket[16]",
    )
    assert tr.parse_partition_by("truncate(3, name)") == (
        "name",
        "truncate[3]",
    )
    for alias in ("days(ts)", "day(ts)", "date(ts)"):
        assert tr.parse_partition_by(alias) == ("ts", "day")
    assert tr.parse_partition_by("months(ts)") == ("ts", "month")
    assert tr.parse_partition_by("years(ts)") == ("ts", "year")
    assert tr.parse_partition_by("hours(ts)") == ("ts", "hour")
    with pytest.raises(UnsupportedOperationError):
        tr.parse_partition_by("zorder(a, b)")


def test_truncate_is_floored():
    # spec examples: truncate(W=10) of 1 -> 0, of -1 -> -10
    assert tr.apply_transform("truncate[10]", 1, "int") == 0
    assert tr.apply_transform("truncate[10]", -1, "int") == -10
    assert tr.apply_transform("truncate[3]", "iceberg", "string") == "ice"
    assert tr.apply_transform(
        "truncate[50]", Decimal("10.65"), "decimal(9,2)"
    ) == Decimal("10.50")


def test_temporal_ordinals():
    ts = dt.datetime(2017, 11, 16, 22, 31, 8)
    assert tr.apply_transform("day", ts, "timestamp") == 17486
    assert tr.apply_transform("day", dt.date(2017, 11, 16), "date") == 17486
    assert tr.apply_transform("year", ts, "timestamp") == 47
    assert tr.apply_transform("month", ts, "timestamp") == 47 * 12 + 10
    assert (
        tr.apply_transform("hour", ts, "timestamp") == 17486 * 24 + 22
    )
    # pre-epoch values floor (spec: ordinals are floored divisions)
    old = dt.datetime(1969, 12, 31, 23, 0, 0)
    assert tr.apply_transform("day", old, "timestamp") == -1
    assert tr.apply_transform("hour", old, "timestamp") == -1
    assert tr.apply_transform("year", old, "timestamp") == -1


def test_prune_keep_bucket_points_only():
    b = tr.apply_transform("bucket[8]", 42, "long")
    assert tr.prune_keep("bucket[8]", "long", b, "=", 42)
    assert not tr.prune_keep("bucket[8]", "long", (b + 1) % 8, "=", 42)
    # hash order is meaningless: ranges always keep
    assert tr.prune_keep("bucket[8]", "long", (b + 1) % 8, ">", 42)
    # null partition: comparison conjuncts can't hold
    assert not tr.prune_keep("bucket[8]", "long", None, "=", 42)


def test_prune_keep_monotonic_ranges():
    # day transform: file holds rows of day 100 only
    d = dt.date(1970, 1, 1) + dt.timedelta(days=100)
    assert tr.prune_keep("day", "date", 100, "=", d)
    assert not tr.prune_keep("day", "date", 99, "=", d)
    # v >= lit needs T(v) >= T(lit)
    assert tr.prune_keep("day", "date", 100, ">=", d)
    assert not tr.prune_keep("day", "date", 99, ">=", d)
    assert tr.prune_keep("day", "date", 100, "<=", d)
    assert not tr.prune_keep("day", "date", 101, "<", d)
    # same-image files always keep under strict ops (rows may straddle)
    assert tr.prune_keep("day", "date", 100, "<", d + dt.timedelta(days=0))
    # truncate on strings
    assert tr.prune_keep("truncate[2]", "string", "ic", "=", "iceberg")
    assert not tr.prune_keep("truncate[2]", "string", "de", "=", "iceberg")
    assert tr.prune_keep("truncate[2]", "string", "de", "<", "iceberg")
    assert not tr.prune_keep("truncate[2]", "string", "zz", "<", "iceberg")


# --------------------------------------------------------------------
# Spark round-trip over a transform-partitioned table
# --------------------------------------------------------------------


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "ice_tfm")


def _events(spark):
    from pyspark.sql import functions as F

    return (
        spark.range(600)
        .select(
            F.col("id").alias("event_id"),
            (
                F.lit(dt.datetime(2024, 1, 1))
                + F.make_interval(hours=F.col("id") % 96)
            ).alias("ts"),
            (F.col("id") % 37).alias("user_id"),
            F.element_at(
                F.array(F.lit("click"), F.lit("view"), F.lit("purchase")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
            (F.col("id") * 1.5).alias("value"),
        )
    )


def test_transform_partitioned_roundtrip_and_pruning(spark, tbl):
    from pyspark.sql import functions as F

    ev = _events(spark)
    write_res = iceberg_py.write_iceberg(
        spark,
        ev,
        tbl,
        mode="create",
        partition_by=[
            "bucket(8, user_id)",
            "days(ts)",
            "truncate(2, event_type)",
        ],
    )
    spec = write_res["partition-specs"][0]["fields"]
    assert [f["transform"] for f in spec] == [
        "bucket[8]",
        "day",
        "truncate[2]",
    ]
    assert [f["name"] for f in spec] == [
        "user_id_bucket",
        "ts_day",
        "event_type_trunc",
    ]

    # source columns STAY in the data files (identity is the only
    # transform allowed to omit them)
    meta = iceberg_py.table_metadata(tbl)
    snap = iceberg_py._select_snapshot(meta)
    data, _pos, _eq = iceberg_py._snapshot_files(meta, snap, tbl)
    import pyarrow.parquet as pq

    cols = pq.read_schema(
        iceberg_py._resolve(data[0]["file_path"], tbl)
    ).names
    assert {"user_id", "ts", "event_type"} <= set(cols)

    back = iceberg_py.read_iceberg(spark, tbl)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, ev.collect())
    )

    schema_obj = iceberg_py._current_schema(meta)
    # bucket pruning: equality point keeps only matching buckets
    uid = 4
    want = tr.apply_transform("bucket[8]", uid, "long")
    kept = iceberg_py.prune_data_files(
        data, schema_obj, [("user_id", "=", uid)]
    )
    assert 0 < len(kept) < len(data)
    fid_user = next(
        f["id"] for f in schema_obj["fields"] if f["name"] == "user_id"
    )
    assert all(
        d["_tpart"][("bucket[8]", fid_user)] == want for d in kept
    )
    n_spark = (
        iceberg_py.read_iceberg(
            spark, tbl, filters=[("user_id", "=", uid)]
        )
        .filter(f"user_id = {uid}")
        .count()
    )
    assert n_spark == ev.filter(f"user_id = {uid}").count() > 0

    # days range pruning: the 4-day spread prunes a mid-range filter
    mid = dt.datetime(2024, 1, 3)
    kept2 = iceberg_py.prune_data_files(
        data, schema_obj, [("ts", ">=", mid)]
    )
    assert 0 < len(kept2) < len(data)
    n2 = (
        iceberg_py.read_iceberg(spark, tbl, filters=[("ts", ">=", mid)])
        .filter(F.col("ts") >= F.lit(mid))
        .count()
    )
    assert n2 == ev.filter(F.col("ts") >= F.lit(mid)).count() > 0
    # a filter beyond the data's range prunes EVERY file
    assert (
        iceberg_py.prune_data_files(
            data, schema_obj, [("ts", ">", dt.datetime(2024, 2, 1))]
        )
        == []
    )

    # truncate pruning on the string column
    kept3 = iceberg_py.prune_data_files(
        data, schema_obj, [("event_type", "=", "click")]
    )
    assert 0 < len(kept3) < len(data)


def test_transform_partitioned_append_and_datasource(spark, tbl):
    ev = _events(spark)
    iceberg_py.write_iceberg(
        spark,
        ev,
        tbl,
        mode="create",
        partition_by=["bucket(4, user_id)"],
    )
    # append partitions by the table's spec automatically
    iceberg_py.write_iceberg(spark, ev.limit(50), tbl, mode="append")
    assert iceberg_py.read_iceberg(spark, tbl).count() == 650
    # explicit partition_by on append must MATCH the spec
    with pytest.raises(UnsupportedOperationError):
        iceberg_py.write_iceberg(
            spark,
            ev.limit(1),
            tbl,
            mode="append",
            partition_by=["bucket(8, user_id)"],
        )
    # the registered DataSource agrees with read_iceberg, filters
    # pruned through pushFilters -> prune_data_files
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    a = (
        spark.read.format("pyiceberg")
        .load(tbl)
        .filter("user_id = 7")
        .count()
    )
    b = (
        iceberg_py.read_iceberg(spark, tbl)
        .filter("user_id = 7")
        .count()
    )
    assert a == b > 0


def test_transform_spec_field_name_collision_refused(spark, tbl):
    from pyspark.sql import functions as F

    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("id_bucket")
    )
    with pytest.raises(UnsupportedOperationError):
        iceberg_py.write_iceberg(
            spark, df, tbl, mode="create", partition_by=["bucket(4, id)"]
        )
