"""Delta UniForm (round 12): Iceberg metadata mirrored over a live
Delta table — every Delta commit regenerates Iceberg metadata under
``<table>/metadata/`` referencing the SAME parquet files, with Delta
deletion vectors re-encoded as Iceberg v3 Puffin DV blobs (both are
roaring position bitmaps, so the conversion is exact). delta-spark's
``delta.universalFormat.enabledFormats=iceberg`` shape; this repo
goes beyond delta-spark by mirroring DV tables (it owns both
codecs)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from local_lakehouse_spark.exceptions import UnsupportedOperationError
from local_lakehouse_spark.sources import delta_py, iceberg_py


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "uniform_tbl")


def _assert_parity(spark, tbl):
    ice = iceberg_py.read_iceberg(spark, tbl)
    de = delta_py.read_delta(spark, tbl)
    assert ice.exceptAll(de).count() == 0
    assert de.exceptAll(ice).count() == 0
    return de.count()


def test_uniform_append_and_dv_parity(spark, tbl):
    """enable -> the hook syncs every later commit: appends, DV
    deletes (converted to Puffin), DV growth (bitmap union) all read
    identically through both formats."""
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") * 2).alias("v"),
    )
    delta_py.write_delta(spark, df, tbl, mode="overwrite")
    meta = iceberg_py.enable_uniform(tbl)
    assert int(meta["format-version"]) == 3
    assert _assert_parity(spark, tbl) == 100

    delta_py.write_delta(
        spark,
        df.select((F.col("k") + 100).alias("k"), "g", "v"),
        tbl,
        mode="append",
    )
    assert _assert_parity(spark, tbl) == 200

    delta_py.delete_where(spark, tbl, "k % 3 = 0")
    assert _assert_parity(spark, tbl) == 133
    # the mirror's delete entries really are Puffin DVs
    meta = iceberg_py.table_metadata(tbl)
    snap = iceberg_py._select_snapshot(meta)
    _d, pos, _e = iceberg_py._snapshot_files(meta, snap, tbl)
    assert pos and all(
        str(p.get("file_format", "")).upper() == "PUFFIN" for p in pos
    )

    # growing a DV replaces the blob and retires the old entry
    # (v3 invariant: at most one live DV per data file)
    delta_py.delete_where(spark, tbl, "k % 7 = 1")
    assert _assert_parity(spark, tbl) == 113
    meta = iceberg_py.table_metadata(tbl)
    snap = iceberg_py._select_snapshot(meta)
    _d, pos, _e = iceberg_py._snapshot_files(meta, snap, tbl)
    refs = [
        os.path.basename(
            iceberg_py._resolve(p["referenced_data_file"], tbl)
        )
        for p in pos
    ]
    assert len(refs) == len(set(refs))

    # a Delta PURGE (REORG ... APPLY PURGE) rewrites the DV-bearing
    # files; the mirror follows with zero live DV entries
    delta_py.purge(spark, tbl)
    assert _assert_parity(spark, tbl) == 113
    meta = iceberg_py.table_metadata(tbl)
    snap = iceberg_py._select_snapshot(meta)
    _d, pos, _e = iceberg_py._snapshot_files(meta, snap, tbl)
    assert not pos


def test_uniform_partitioned_pruning_and_manifest_reuse(spark, tbl):
    """Hive-partitioned Delta mirrors as an identity spec (partition
    values from the add actions — the y38 convert mechanism), the
    Iceberg side prunes on it, and an append-only sync REUSES the
    prior data manifest instead of re-listing the table."""
    df = spark.range(0, 60).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
    )
    delta_py.write_delta(
        spark, df, tbl, mode="overwrite", partition_by=["g"]
    )
    iceberg_py.enable_uniform(tbl)
    assert _assert_parity(spark, tbl) == 60
    pruned = iceberg_py.read_iceberg(
        spark, tbl, filters=[("g", "=", "1")]
    )
    assert pruned.count() == 20

    m1 = iceberg_py.table_metadata(tbl)
    rows1 = {
        r["manifest_path"]
        for r in iceberg_py._manifest_list_rows(
            iceberg_py._select_snapshot(m1), tbl
        )
    }
    delta_py.write_delta(
        spark,
        df.select((F.col("k") + 60).alias("k"), "g"),
        tbl,
        mode="append",
    )
    m2 = iceberg_py.table_metadata(tbl)
    rows2 = {
        r["manifest_path"]
        for r in iceberg_py._manifest_list_rows(
            iceberg_py._select_snapshot(m2), tbl
        )
    }
    assert rows1 < rows2  # strict superset: carried + one new
    assert _assert_parity(spark, tbl) == 120


def test_uniform_schema_evolution_preserves_ids(spark, tbl):
    """A mergeSchema append commits a NEW schema-id on the mirror;
    pre-existing columns keep their field ids (names are the
    identity without column mapping) and both reads agree."""
    df = spark.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    delta_py.write_delta(spark, df, tbl, mode="overwrite")
    iceberg_py.enable_uniform(tbl)
    ids_before = {
        f["name"]: f["id"]
        for f in iceberg_py._current_schema(
            iceberg_py.table_metadata(tbl)
        )["fields"]
    }
    delta_py.write_delta(
        spark,
        spark.range(100, 110).select(
            F.col("id").alias("k"),
            F.lit(0).alias("g"),
            F.lit(1.5).alias("w"),
        ),
        tbl,
        mode="append",
        merge_schema=True,
    )
    sch = iceberg_py._current_schema(iceberg_py.table_metadata(tbl))
    ids_after = {f["name"]: f["id"] for f in sch["fields"]}
    for name, fid in ids_before.items():
        assert ids_after[name] == fid
    assert "w" in ids_after
    assert _assert_parity(spark, tbl) == 40


def test_uniform_one_way_guards_and_idempotency(spark, tbl):
    """Iceberg-side writes refuse (one-way mirror), re-syncing an
    already-mirrored version is a no-op, foreign Iceberg metadata
    refuses the sync, and column-mapped Delta refuses with a
    materialization pointer."""
    df = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("g")
    )
    delta_py.write_delta(spark, df, tbl, mode="overwrite")
    iceberg_py.enable_uniform(tbl)
    with pytest.raises(UnsupportedOperationError, match="UniForm"):
        iceberg_py.write_iceberg(spark, df, tbl, mode="append")
    with pytest.raises(UnsupportedOperationError, match="UniForm"):
        iceberg_py.dv_delete_iceberg_where(spark, tbl, "k = 1")
    with pytest.raises(UnsupportedOperationError, match="UniForm"):
        iceberg_py.compact_data_files(spark, tbl)

    m1 = iceberg_py.table_metadata(tbl)
    m2 = iceberg_py.sync_uniform(tbl)  # same version: no-op
    assert m1["current-snapshot-id"] == m2["current-snapshot-id"]
    assert len(m1["snapshots"]) == len(m2["snapshots"])


def test_uniform_refuses_foreign_iceberg_and_column_mapping(
    spark, tmp_path
):
    # column-mapped Delta: physical names need a rewrite to mirror
    cm = str(tmp_path / "cm")
    delta_py.write_delta(
        spark,
        spark.range(5).select(F.col("id").alias("k")),
        cm,
        mode="overwrite",
        column_mapping=True,
    )
    with pytest.raises(
        UnsupportedOperationError, match="column-mapped"
    ):
        iceberg_py.sync_uniform(cm)

    # FOREIGN Iceberg metadata at the path refuses the sync: a
    # native Iceberg table that also gains a Delta log must never
    # have its metadata clobbered by the mirror
    ice = str(tmp_path / "ice")
    iceberg_py.write_iceberg(
        spark,
        spark.range(5).select(F.col("id").alias("k")),
        ice,
        mode="create",
    )
    delta_py.write_delta(
        spark,
        spark.range(5).select(F.col("id").alias("k")),
        ice,
        mode="overwrite",
    )
    with pytest.raises(
        UnsupportedOperationError, match="not written by uniform"
    ):
        iceberg_py.sync_uniform(ice)


def test_uniform_datasource_read_parity(spark, tbl):
    """The registered pyiceberg DataSource reads the mirror too —
    per-task Arrow path with the Puffin DV mask."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    df = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g")
    )
    delta_py.write_delta(spark, df, tbl, mode="overwrite")
    iceberg_py.enable_uniform(tbl)
    delta_py.delete_where(spark, tbl, "k % 5 = 2")
    jvm = iceberg_py.read_iceberg(spark, tbl)
    ds = spark.read.format("pyiceberg").load(tbl)
    assert jvm.exceptAll(ds).count() == 0
    assert ds.exceptAll(jvm).count() == 0
    assert ds.count() == 40
