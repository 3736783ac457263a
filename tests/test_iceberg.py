"""Iceberg table-format support (sources/iceberg_py.py): metadata
discovery, snapshot selection, manifest decoding via the pure-Python
Avro codec, FIELD-ID column resolution, v2 position AND equality
deletes (sequence-number rule), schema evolution, shallow CONVERT to
Delta, and loud refusals for the unimplemented (v3, dropped-field-id
deletes).

Reference parity: the reference's lakehouse surface is described as
Delta/Iceberg (BASELINE.md); it delegates both to its Rust layer
(reference uchelper/dataframe.py:198-199) while this repo implements
the public specs directly.
"""

from __future__ import annotations

import json
import os

import pytest

from local_lakehouse_spark.exceptions import (
    DoesNotExistError,
    UnsupportedOperationError,
)
from local_lakehouse_spark.sources import avro_py, iceberg_py
from local_lakehouse_spark.sources.iceberg_py import (
    delete_iceberg_where,
    is_iceberg_table,
    read_iceberg,
    table_metadata,
    write_iceberg,
)


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "ice")


def test_create_write_read_roundtrip(spark, tbl):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)],
        "id long, s string, v double",
    ).coalesce(2)
    meta = write_iceberg(spark, df, tbl, mode="create")
    assert is_iceberg_table(tbl)
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == meta["snapshots"][0]["snapshot-id"]
    # version-hint resolution picks the committed metadata
    assert table_metadata(tbl)["current-snapshot-id"] == meta[
        "current-snapshot-id"
    ]
    out = read_iceberg(spark, tbl)
    assert out.columns == ["id", "s", "v"]
    rows = {r.id: (r.s, r.v) for r in out.collect()}
    assert rows == {1: ("a", 1.5), 2: ("b", 2.5), 3: ("c", 3.5)}
    # data footers carry the Iceberg field ids (the binding contract)
    import pyarrow.parquet as pq

    ddir = os.path.join(tbl, "data")
    f = [n for n in os.listdir(ddir) if n.endswith(".parquet")][0]
    ids = {
        fld.name: (fld.metadata or {}).get(b"PARQUET:field_id")
        for fld in pq.read_schema(os.path.join(ddir, f))
    }
    assert ids == {"id": b"1", "s": b"2", "v": b"3"}


def test_append_and_time_travel(spark, tbl):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    write_iceberg(spark, df, tbl, mode="create")
    snap0 = table_metadata(tbl)["current-snapshot-id"]
    ts0 = table_metadata(tbl)["snapshots"][0]["timestamp-ms"]
    write_iceberg(
        spark,
        spark.createDataFrame([(2, "b")], "id long, s string"),
        tbl,
        mode="append",
    )
    assert read_iceberg(spark, tbl).count() == 2
    # snapshot-id time travel
    assert read_iceberg(spark, tbl, snapshot_id=snap0).count() == 1
    # timestamp time travel (snapshot commit times are monotone)
    assert read_iceberg(spark, tbl, timestamp_ms=ts0).count() == 1
    with pytest.raises(DoesNotExistError):
        read_iceberg(spark, tbl, timestamp_ms=ts0 - 60_000)
    with pytest.raises(DoesNotExistError):
        read_iceberg(spark, tbl, snapshot_id=123456)


def test_position_delete(spark, tbl):
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(10)], "id long, s string"
    ).coalesce(2)
    write_iceberg(spark, df, tbl, mode="create")
    pre = table_metadata(tbl)["current-snapshot-id"]
    delete_iceberg_where(spark, tbl, "id % 3 = 0")
    got = sorted(r.id for r in read_iceberg(spark, tbl).collect())
    assert got == [1, 2, 4, 5, 7, 8]
    # data files untouched (merge-on-read): time travel sees all rows
    assert read_iceberg(spark, tbl, snapshot_id=pre).count() == 10
    # a second delete must not re-list already-deleted positions
    delete_iceberg_where(spark, tbl, "id = 1")
    got = sorted(r.id for r in read_iceberg(spark, tbl).collect())
    assert got == [2, 4, 5, 7, 8]
    meta = table_metadata(tbl)
    assert [s["summary"]["operation"] for s in meta["snapshots"]] == [
        "append",
        "delete",
        "delete",
    ]
    # sequence numbers advance per commit, spec v2
    assert [s["sequence-number"] for s in meta["snapshots"]] == [1, 2, 3]


def test_schema_evolution_add_and_rename(spark, tbl):
    """Field-id resolution is what makes Iceberg evolution safe: an
    ADDED column's id is absent from old footers and surfaces as
    NULL; a RENAME (same id, new name) is invisible to the scan."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    write_iceberg(spark, df, tbl, mode="create")
    mfile = os.path.join(tbl, "metadata", "v1.metadata.json")
    meta = json.load(open(mfile))
    fields = meta["schemas"][0]["fields"]
    fields.append(
        {"id": 3, "name": "score", "required": False, "type": "double"}
    )
    fields[1]["name"] = "label"  # rename s -> label, id 2 unchanged
    meta["last-column-id"] = 3
    with open(os.path.join(tbl, "metadata", "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(
        os.path.join(tbl, "metadata", "version-hint.text"), "w"
    ) as fh:
        fh.write("2")
    out = read_iceberg(spark, tbl)
    assert out.columns == ["id", "label", "score"]
    rows = {r.id: (r.label, r.score) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", None)}


def _commit_equality_delete(
    spark, tbl, rows, schema_str, eq_ids,
    partition=None, partition_fields=None, spec_id=0,
):
    """Hand-commit an equality-delete snapshot the way a Flink CDC
    writer would: a parquet file holding the delete VALUE tuples
    (footers field-id stamped) + a content=2 manifest entry carrying
    equality_ids, at the next sequence number. ``partition`` (tuple
    aligned to ``partition_fields`` avro defs) commits a
    PARTITION-SCOPED delete — it must apply only within that
    partition."""
    import pyarrow.parquet as pq  # noqa: F401 (import sanity)

    from pyspark.sql import functions as F

    meta = table_metadata(tbl)
    ids = {
        f["name"]: f["id"]
        for f in meta["schemas"][0]["fields"]
    }
    df = spark.createDataFrame(rows, schema_str)
    stamped = df.select(
        *[
            F.col(c).alias(c, metadata={"parquet.field.id": ids[c]})
            for c in df.columns
        ]
    )
    tmp = tbl + "_eqtmp"
    stamped.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = [
        os.path.join(tmp, n)
        for n in os.listdir(tmp)
        if n.endswith(".parquet")
    ][0]
    import uuid as _uuid

    dest = os.path.join(
        tbl, "data", f"eqdel-{_uuid.uuid4().hex[:8]}.parquet"
    )
    os.replace(src, dest)
    seq = int(meta.get("last-sequence-number", 0)) + 1
    sid = iceberg_py._new_snapshot_id()
    mrow = iceberg_py._write_manifest(
        tbl,
        [
            {
                "file_path": dest,
                "record_count": len(rows),
                "file_size_in_bytes": os.path.getsize(dest),
                "partition": partition,
            }
        ],
        sid,
        seq,
        content=2,
        equality_ids=eq_ids,
        partition_fields=partition_fields,
        spec_id=spec_id,
    )
    prior = iceberg_py._prior_manifest_rows(meta, tbl)
    iceberg_py._commit_snapshot(
        tbl, meta, prior + [mrow["row"]], "delete", sid
    )


def test_equality_deletes_apply_with_sequence_rule(spark, tbl):
    """v2 equality deletes: rows matching the delete's key values
    disappear from data files with SMALLER sequence numbers, while a
    re-insert AFTER the delete (larger sequence) survives — the
    spec's CDC upsert pattern. Null-safe matching included."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "n")],
        "id long, s string",
    )
    write_iceberg(spark, df, tbl, mode="create")  # seq 1
    _commit_equality_delete(
        spark, tbl, [(2,), (None,)], "id long", eq_ids=[1]
    )  # seq 2: delete id=2 AND id IS NULL
    got = sorted(
        (r.id, r.s)
        for r in read_iceberg(spark, tbl).collect()
    )
    assert got == [(1, "a"), (3, "c")]
    # re-insert id=2 AFTER the delete: seq 3 > 2 -> survives
    write_iceberg(
        spark,
        spark.createDataFrame([(2, "b2")], "id long, s string"),
        tbl,
        mode="append",
    )
    got = sorted(
        (r.id, r.s) for r in read_iceberg(spark, tbl).collect()
    )
    assert got == [(1, "a"), (2, "b2"), (3, "c")]
    # a delete referencing a dropped/unknown field id refuses
    _commit_equality_delete(
        spark, tbl, [("x",)], "s string", eq_ids=[99]
    )
    with pytest.raises(UnsupportedOperationError, match="field ids"):
        read_iceberg(spark, tbl).collect()


def test_not_a_table_and_version_guard(spark, tbl, tmp_path):
    assert not is_iceberg_table(str(tmp_path / "nope"))
    with pytest.raises(DoesNotExistError):
        table_metadata(str(tmp_path / "nope"))
    df = spark.createDataFrame([(1,)], "id long")
    write_iceberg(spark, df, tbl, mode="create")
    mfile = os.path.join(tbl, "metadata", "v1.metadata.json")
    meta = json.load(open(mfile))
    # v3 reads since r11 (deletion vectors); v4 is beyond the spec
    meta["format-version"] = 4
    with open(mfile, "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(UnsupportedOperationError, match="format-version"):
        read_iceberg(spark, tbl)


def test_manifest_avro_is_foreign_decodable(spark, tbl):
    """The manifests we write are plain spec Avro: a fresh decode of
    the manifest list + manifest through the container reader (the
    path a foreign tool would take) yields the committed file."""
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    write_iceberg(spark, df, tbl, mode="create")
    meta = table_metadata(tbl)
    snap = meta["snapshots"][0]
    with open(snap["manifest-list"], "rb") as fh:
        schema, rows = avro_py.read_container(fh.read())
    assert schema["name"] == "manifest_file"
    names = [f["name"] for f in schema["fields"]]
    mf = dict(zip(names, rows[0]))
    assert mf["content"] == 0 and mf["added_files_count"] == 1
    with open(mf["manifest_path"], "rb") as fh:
        eschema, entries = avro_py.read_container(fh.read())
    assert eschema["name"] == "manifest_entry"
    entry = dict(zip([f["name"] for f in eschema["fields"]], entries[0]))
    assert entry["status"] == 1
    assert entry["snapshot_id"] == snap["snapshot-id"]
    data_file = dict(
        zip(
            [
                f["name"]
                for f in [
                    f
                    for f in eschema["fields"]
                    if f["name"] == "data_file"
                ][0]["type"]["fields"]
            ],
            entry["data_file"],
        )
    )
    assert data_file["content"] == 0
    assert os.path.exists(data_file["file_path"])
    assert data_file["record_count"] == 1


def test_convert_iceberg_to_delta_shallow(spark, tbl, tmp_path):
    """SHALLOW CONVERT: the Delta log at dest references the Iceberg
    data files in place (absolute paths, zero data copied), carries
    numRecords stats, and reads identically through read_delta. A
    source with deletes refuses — a shallow convert would resurrect
    deleted rows."""
    from local_lakehouse_spark.sources import delta_py
    from local_lakehouse_spark.sources.iceberg_py import (
        convert_iceberg_to_delta,
    )

    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(20)], "id long, s string"
    ).coalesce(2)
    write_iceberg(spark, df, tbl, mode="create")
    dest = str(tmp_path / "delta")
    snap = convert_iceberg_to_delta(spark, tbl, dest)
    assert delta_py.is_delta_table(dest)
    # no data copied: every add points into the ICEBERG data dir
    for rel, add in snap.adds.items():
        assert rel.startswith(os.path.join(tbl, "data") + "/")
        assert json.loads(add["stats"])["numRecords"] > 0
    back = delta_py.read_delta(spark, dest)
    assert sorted(r.id for r in back.collect()) == list(range(20))
    # numRecords-only stats: skipping has no min/max to prove a miss,
    # so every file is (correctly) kept — pruning is an optimization
    kept = delta_py.candidate_files(snap, "id", ">", 10_000)
    assert len(kept) == len(snap.adds)
    # a deleted-rows source refuses the shallow path
    delete_iceberg_where(spark, tbl, "id = 3")
    with pytest.raises(UnsupportedOperationError, match="SHALLOW"):
        convert_iceberg_to_delta(spark, tbl, str(tmp_path / "d2"))


def test_pyiceberg_registered_format(spark, tbl):
    """spark.read.format('pyiceberg'): per-file Arrow partitions,
    field-id binding, per-file position-delete application, and
    snapshotId time travel — matching read_iceberg row-for-row."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(12)], "id long, s string"
    ).coalesce(3)
    write_iceberg(spark, df, tbl, mode="create")
    delete_iceberg_where(spark, tbl, "id IN (2, 7)")
    out = spark.read.format("pyiceberg").load(tbl)
    assert out.columns == ["id", "s"]
    got = sorted(r.id for r in out.collect())
    assert got == [0, 1, 3, 4, 5, 6, 8, 9, 10, 11]
    # row-for-row parity with the JVM-side reader
    jvm_side = sorted(r.id for r in read_iceberg(spark, tbl).collect())
    assert got == jvm_side
    # snapshotId option time-travels to the pre-delete snapshot
    snap0 = table_metadata(tbl)["snapshots"][0]["snapshot-id"]
    assert (
        spark.read.format("pyiceberg")
        .option("snapshotId", snap0)
        .load(tbl)
        .count()
        == 12
    )
    # equality deletes apply per-file with the sequence rule,
    # matching the JVM-side reader row-for-row
    _commit_equality_delete(spark, tbl, [(4,)], "id long", eq_ids=[1])
    got = sorted(
        r.id
        for r in spark.read.format("pyiceberg").load(tbl).collect()
    )
    assert got == [0, 1, 3, 5, 6, 8, 9, 10, 11]
    assert got == sorted(
        r.id for r in read_iceberg(spark, tbl).collect()
    )


def test_expire_snapshots(spark, tbl):
    """expireSnapshots + orphan cleanup: old snapshots leave the
    metadata (time travel to them raises), their now-unreferenced
    manifest lists/manifests delete, data files any SURVIVING
    manifest lists are never touched, and the current read is
    unchanged. A planted orphan data file referenced only by an
    expired snapshot is removed."""
    from local_lakehouse_spark.sources.iceberg_py import (
        expire_snapshots,
    )

    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(6)], "id long, s string"
    )
    write_iceberg(spark, df, tbl, mode="create")
    write_iceberg(
        spark,
        spark.createDataFrame([(100, "x")], "id long, s string"),
        tbl,
        mode="append",
    )
    delete_iceberg_where(spark, tbl, "id = 100")
    meta = table_metadata(tbl)
    old = [s["snapshot-id"] for s in meta["snapshots"][:-1]]
    mlists_old = [
        s["manifest-list"] for s in meta["snapshots"][:-1]
    ]
    now = meta["snapshots"][-1]["timestamp-ms"] + 1
    out = expire_snapshots(tbl, older_than_ms=now, retain_last=1)
    assert sorted(out["expired"]) == sorted(old)
    # expired manifest lists are gone; surviving one intact
    for ml in mlists_old:
        assert not os.path.exists(ml)
    meta2 = table_metadata(tbl)
    assert len(meta2["snapshots"]) == 1
    # current read identical (live data carried forward by manifests)
    got = sorted(r.id for r in read_iceberg(spark, tbl).collect())
    assert got == list(range(6))
    # time travel to an expired snapshot raises
    with pytest.raises(DoesNotExistError):
        read_iceberg(spark, tbl, snapshot_id=old[0])
    # nothing to expire on a second call
    assert expire_snapshots(tbl, older_than_ms=now) == {
        "expired": [],
        "deleted_files": [],
    }


def test_pyiceberg_streaming_source(spark, tbl, tmp_path):
    """readStream.format('pyiceberg'): sequence-number offsets,
    startingSnapshotId replay, incremental resume picking up only new
    append snapshots, and delete snapshots skipped whole under
    skipChangeCommits."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    write_iceberg(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"),
        tbl,
        mode="create",
    )
    first = table_metadata(tbl)["snapshots"][0]["snapshot-id"]
    write_iceberg(
        spark,
        spark.createDataFrame([(3, "c")], "id long, s string"),
        tbl,
        mode="append",
    )

    def run():
        q = (
            spark.readStream.format("pyiceberg")
            .option("startingSnapshotId", first)
            .option("skipChangeCommits", "true")
            .load(tbl)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = spark.read.parquet(out)
    assert sorted(r.id for r in got.collect()) == [1, 2, 3]
    # a position-delete snapshot is SKIPPED whole (skipChangeCommits),
    # then a later append resumes incrementally
    delete_iceberg_where(spark, tbl, "id = 2")
    write_iceberg(
        spark,
        spark.createDataFrame([(4, "d")], "id long, s string"),
        tbl,
        mode="append",
    )
    run()
    got = spark.read.parquet(out)
    assert sorted(r.id for r in got.collect()) == [1, 2, 3, 4]


def test_pyiceberg_stream_refuses_change_snapshot(spark, tbl, tmp_path):
    """Without skipChangeCommits a delete snapshot in the replay
    range fails the stream loudly (replaying around it would emit
    rows the table no longer has)."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    write_iceberg(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"),
        tbl,
        mode="create",
    )
    first = table_metadata(tbl)["snapshots"][0]["snapshot-id"]
    delete_iceberg_where(spark, tbl, "id = 2")
    q = (
        spark.readStream.format("pyiceberg")
        .option("startingSnapshotId", first)
        .load(tbl)
        .writeStream.format("noop")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt_refuse")
        )
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="skipChangeCommits"):
        q.awaitTermination()


def test_manifest_bounds_written_and_pruning(spark, tbl):
    """Column bounds land in the manifests at write time (the spec's
    single-value serialization, computed from parquet footers) and
    drive scan planning: read_iceberg(filters=) and the pyiceberg
    pushFilters drop files whose bounds prove no match — and never a
    file that might match."""
    from pyspark.sql import functions as F

    from local_lakehouse_spark.sources.iceberg_py import (
        _bounds_map,
        _decode_bound,
        _select_snapshot,
        _snapshot_files,
        prune_data_files,
    )

    df = (
        spark.range(0, 1000)
        .select(
            F.col("id").cast("long").alias("id"),
            F.concat(F.lit("s"), F.col("id")).alias("s"),
        )
        .repartitionByRange(4, "id")
    )
    write_iceberg(spark, df, tbl, mode="create")
    meta = table_metadata(tbl)
    schema_obj = meta["schemas"][0]
    data, _pos, _eq = _snapshot_files(
        meta, _select_snapshot(meta), tbl
    )
    assert len(data) == 4
    # bounds round-trip: every file carries a decodable long range
    for d in data:
        lo = _decode_bound(_bounds_map(d["lower_bounds"])[1], "long")
        hi = _decode_bound(_bounds_map(d["upper_bounds"])[1], "long")
        assert 0 <= lo <= hi <= 999
    # range-partitioned layout: a point-ish conjunct prunes most files
    kept = prune_data_files(data, schema_obj, [("id", ">=", 990)])
    assert 1 <= len(kept) < 4
    # filters= parity with read_delta: pruned read, right rows
    got = sorted(
        r.id
        for r in read_iceberg(spark, tbl, filters=[("id", ">=", 990)])
        .filter("id >= 990")
        .collect()
    )
    assert got == list(range(990, 1000))
    # pushFilters path: the registered format returns correct rows
    # (Spark re-applies the predicate row-level after pruning)
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    got2 = sorted(
        r.id
        for r in spark.read.format("pyiceberg")
        .load(tbl)
        .filter("id >= 990")
        .collect()
    )
    assert got2 == list(range(990, 1000))
    # direct reader probe: pruning actually fired
    rd = pyiceberg_source._PyIcebergReader({"path": tbl})
    from pyspark.sql.datasource import GreaterThanOrEqual

    rd.pushFilters([GreaterThanOrEqual(("id",), 990)])
    assert rd._files_pruned >= 1
    # string bounds prune too
    kept_s = prune_data_files(data, schema_obj, [("s", "<", "a")])
    assert kept_s == []  # every s starts with 's' > 'a'... proves none


def test_pyiceberg_as_of_timestamp_option(spark, tbl):
    """The batch format's asOfTimestampMs option resolves the latest
    snapshot at or before the instant, like read_iceberg."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    write_iceberg(
        spark,
        spark.createDataFrame([(1, "a")], "id long, s string"),
        tbl,
        mode="create",
    )
    ts0 = table_metadata(tbl)["snapshots"][0]["timestamp-ms"]
    write_iceberg(
        spark,
        spark.createDataFrame([(2, "b")], "id long, s string"),
        tbl,
        mode="append",
    )
    assert (
        spark.read.format("pyiceberg")
        .option("asOfTimestampMs", ts0)
        .load(tbl)
        .count()
        == 1
    )
    assert spark.read.format("pyiceberg").load(tbl).count() == 2


# ---------------------------------------------------------------------------
# round 9: advisor fixes (date bounds, foreign-append guards,
# snapshot-schema time travel, watermark, required columns) +
# merge_schema evolution appends
# ---------------------------------------------------------------------------


def test_date_column_write_and_bound_pruning(spark, tbl):
    """write_iceberg on a DATE column must not crash encoding bounds
    (pyarrow stats surface datetime.date); the bound must round-trip
    and prune."""
    import datetime

    df = spark.createDataFrame(
        [
            (1, datetime.date(2024, 1, 1)),
            (2, datetime.date(2024, 6, 30)),
        ],
        "id long, d date",
    ).coalesce(1)
    meta = write_iceberg(spark, df, tbl, mode="create")
    snap = iceberg_py._select_snapshot(meta)
    data, _pos, _eq = iceberg_py._snapshot_files(meta, snap, tbl)
    schema_obj = iceberg_py._current_schema(meta)
    lo = iceberg_py._decode_bound(
        iceberg_py._bounds_map(data[0]["lower_bounds"])[2], "date"
    )
    hi = iceberg_py._decode_bound(
        iceberg_py._bounds_map(data[0]["upper_bounds"])[2], "date"
    )
    assert (lo, hi) == (
        datetime.date(2024, 1, 1),
        datetime.date(2024, 6, 30),
    )
    kept = iceberg_py.prune_data_files(
        data, schema_obj, [("d", ">", datetime.date(2024, 7, 1))]
    )
    assert kept == []
    kept = iceberg_py.prune_data_files(
        data, schema_obj, [("d", ">=", datetime.date(2024, 3, 1))]
    )
    assert len(kept) == 1
    out = read_iceberg(spark, tbl)
    assert out.count() == 2


def test_append_refuses_format_version_1(spark, tbl):
    """Carrying a v1 manifest list forward would fabricate sequence
    numbers — the append path must refuse."""
    write_iceberg(
        spark,
        spark.createDataFrame([(1,)], "id long"),
        tbl,
        mode="create",
    )
    mdir = os.path.join(tbl, "metadata")
    meta = json.load(open(os.path.join(mdir, "v1.metadata.json")))
    meta["format-version"] = 1
    with open(os.path.join(mdir, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write("2")
    with pytest.raises(UnsupportedOperationError, match="format-version 1"):
        write_iceberg(
            spark,
            spark.createDataFrame([(2,)], "id long"),
            tbl,
            mode="append",
        )


def test_prior_manifest_rows_remap_by_name(spark, tbl):
    """A foreign manifest list whose avro schema orders fields
    differently must still carry forward with correct sequence
    numbers (by-name re-map, never positional)."""
    write_iceberg(
        spark,
        spark.createDataFrame([(1,)], "id long"),
        tbl,
        mode="create",
    )
    meta = table_metadata(tbl)
    snap = iceberg_py._select_snapshot(meta)
    mlist = iceberg_py._resolve(snap["manifest-list"], tbl)
    rows = iceberg_py._read_avro_dicts(mlist)
    # rewrite the manifest list with REORDERED fields (a foreign
    # writer's layout) and re-point the snapshot at it
    reordered = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "added_snapshot_id", "type": "long"},
            {"name": "sequence_number", "type": "long"},
            {"name": "min_sequence_number", "type": "long"},
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "content", "type": "int"},
        ],
    }
    foreign = mlist + ".foreign.avro"
    avro_py.write_container(
        foreign,
        reordered,
        iter(
            [
                (
                    r["added_snapshot_id"],
                    r["sequence_number"],
                    r["min_sequence_number"],
                    r["manifest_path"],
                    r["manifest_length"],
                    r["content"],
                )
                for r in rows
            ]
        ),
    )
    mdir = os.path.join(tbl, "metadata")
    m2 = json.load(open(os.path.join(mdir, "v1.metadata.json")))
    m2["snapshots"][0]["manifest-list"] = foreign
    with open(os.path.join(mdir, "v2.metadata.json"), "w") as fh:
        json.dump(m2, fh)
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write("2")
    carried = iceberg_py._prior_manifest_rows(table_metadata(tbl), tbl)
    names = [
        f["name"] for f in iceberg_py._MANIFEST_FILE_SCHEMA["fields"]
    ]
    row = dict(zip(names, carried[0]))
    assert row["manifest_path"] == rows[0]["manifest_path"]
    assert row["sequence_number"] == rows[0]["sequence_number"]
    assert row["added_snapshot_id"] == rows[0]["added_snapshot_id"]
    # and an actual append over the foreign layout stays readable
    write_iceberg(
        spark,
        spark.createDataFrame([(2,)], "id long"),
        tbl,
        mode="append",
    )
    assert sorted(
        r.id for r in read_iceberg(spark, tbl).collect()
    ) == [1, 2]
    seqs = [
        s["sequence-number"] for s in table_metadata(tbl)["snapshots"]
    ]
    assert seqs == [1, 2]


def test_time_travel_binds_snapshot_schema(spark, tbl):
    """VERSION AS OF after add-column evolution must show the
    SNAPSHOT's schema (no phantom post-evolution columns)."""
    write_iceberg(
        spark,
        spark.createDataFrame([(1, "a")], "id long, s string"),
        tbl,
        mode="create",
    )
    snap0 = table_metadata(tbl)["current-snapshot-id"]
    write_iceberg(
        spark,
        spark.createDataFrame(
            [(2, "b", 9.5)], "id long, s string, score double"
        ),
        tbl,
        mode="append",
        merge_schema=True,
    )
    cur = read_iceberg(spark, tbl)
    assert cur.columns == ["id", "s", "score"]
    old = read_iceberg(spark, tbl, snapshot_id=snap0)
    assert old.columns == ["id", "s"]
    assert old.count() == 1


def test_merge_schema_append_evolves(spark, tbl):
    """Add-column evolution on append: fresh field ids past the
    watermark, a new schema-id, NULLs from pre-evolution files."""
    write_iceberg(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"),
        tbl,
        mode="create",
    )
    with pytest.raises(UnsupportedOperationError, match="merge_schema"):
        write_iceberg(
            spark,
            spark.createDataFrame([(3, "c", 1.0)], "id long, s string, v double"),
            tbl,
            mode="append",
        )
    write_iceberg(
        spark,
        spark.createDataFrame([(3, "c", 1.0)], "id long, s string, v double"),
        tbl,
        mode="append",
        merge_schema=True,
    )
    meta = table_metadata(tbl)
    assert meta["current-schema-id"] == 1
    assert meta["last-column-id"] == 3
    sch = iceberg_py._current_schema(meta)
    assert [(f["name"], f["id"]) for f in sch["fields"]] == [
        ("id", 1),
        ("s", 2),
        ("v", 3),
    ]
    rows = {r.id: r.v for r in read_iceberg(spark, tbl).collect()}
    assert rows == {1: None, 2: None, 3: 1.0}


def test_last_column_id_high_water_nested(spark):
    """Nested element ids allocate past the parent; last-column-id
    must record the allocator's high-water mark, not the top-level
    max."""
    import pyspark.sql.types as T

    alloc = {"n": 0}

    def nid():
        alloc["n"] += 1
        return alloc["n"]

    st = iceberg_py._spark_to_iceberg_type(
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField(
                    "tags", T.ArrayType(T.StringType())
                ),
            ]
        ),
        nid,
    )
    top_max = max(f["id"] for f in st["fields"])
    assert alloc["n"] > top_max  # the list element id is past it


def test_append_refuses_missing_required_column(spark, tbl):
    """An append omitting a required (non-null) schema column would
    silently read back NULL — it must refuse."""
    write_iceberg(
        spark,
        spark.createDataFrame([(1, "a")], "id long, s string"),
        tbl,
        mode="create",
    )
    mdir = os.path.join(tbl, "metadata")
    meta = json.load(open(os.path.join(mdir, "v1.metadata.json")))
    for f in meta["schemas"][0]["fields"]:
        if f["name"] == "s":
            f["required"] = True
    with open(os.path.join(mdir, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write("2")
    with pytest.raises(UnsupportedOperationError, match="required"):
        write_iceberg(
            spark,
            spark.createDataFrame([(2,)], "id long"),
            tbl,
            mode="append",
        )


def test_compact_data_files_replace_snapshot(spark, tbl):
    """rewrite_data_files as a REPLACE snapshot: identical rows after,
    old layout still time-travelable, position deletes absorbed, and
    status=2 removed entries preserving original sequence numbers."""
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(20)], "id long, s string"
    ).repartition(4)
    write_iceberg(spark, df, tbl, mode="create")
    delete_iceberg_where(spark, tbl, "id >= 15")
    pre = table_metadata(tbl)["current-snapshot-id"]
    meta = iceberg_py.compact_data_files(spark, tbl, target_num_files=1)
    assert meta["snapshots"][-1]["summary"]["operation"] == "replace"
    got = sorted(r.id for r in read_iceberg(spark, tbl).collect())
    assert got == list(range(15))
    # exactly one live data file, no live delete files
    snap = iceberg_py._select_snapshot(meta)
    data, pos, eq = iceberg_py._snapshot_files(meta, snap, tbl)
    assert len(data) == 1 and pos == [] and eq == []
    # pre-compaction snapshot still reads the old layout
    assert read_iceberg(spark, tbl, snapshot_id=pre).count() == 15
    # removed entries preserved their original data sequence numbers
    mlist = iceberg_py._resolve(
        meta["snapshots"][-1]["manifest-list"], tbl
    )
    removed_seqs = set()
    for mf in iceberg_py._read_avro_dicts(mlist):
        for e in iceberg_py._read_avro_dicts(
            iceberg_py._resolve(mf["manifest_path"], tbl)
        ):
            if e["status"] == 2:
                removed_seqs.add(e["sequence_number"])
    assert removed_seqs == {1, 2}  # create-seq data + delete-seq file


def test_pyiceberg_stream_gates_replace_snapshot(spark, tbl, tmp_path):
    """The round-8 judge's finding: a REPLACE/compaction snapshot
    (removes data files, adds rewritten ones, NO delete files) must
    (a) fail the stream without skipChangeCommits, (b) skip WHOLE
    with it — never replay the rewritten files as duplicate
    inserts."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    write_iceberg(
        spark,
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, s string"
        ).repartition(2),
        tbl,
        mode="create",
    )
    first = table_metadata(tbl)["snapshots"][0]["snapshot-id"]
    iceberg_py.compact_data_files(spark, tbl)  # REPLACE, no deletes
    # (a) without the option: loud failure
    q = (
        spark.readStream.format("pyiceberg")
        .option("startingSnapshotId", first)
        .load(tbl)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck_fail"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="skipChangeCommits"):
        q.awaitTermination()
    # (b) with it: the replace snapshot skips whole; a later append
    # still replays — and nothing duplicates
    write_iceberg(
        spark,
        spark.createDataFrame([(3, "c")], "id long, s string"),
        tbl,
        mode="append",
    )
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("pyiceberg")
        .option("startingSnapshotId", first)
        .option("skipChangeCommits", "true")
        .load(tbl)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck_skip"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]  # initial snapshot + append; NO dupes


# ---------------------------------------------------------------------------
# identity-partitioned tables (round 9): foreign-style layout —
# partition values live ONLY in manifest metadata, data parquet
# omits the columns — read via injection, pruned via partition values
# ---------------------------------------------------------------------------


def test_partitioned_write_read_both_paths(spark, tbl):
    df = spark.createDataFrame(
        [(i, i % 3, f"s{i}") for i in range(12)],
        "id long, bucket int, s string",
    )
    write_iceberg(spark, df, tbl, mode="create", partition_by=["bucket"])
    meta = table_metadata(tbl)
    spec = meta["partition-specs"][0]
    assert spec["fields"] == [
        {
            "name": "bucket",
            "transform": "identity",
            "source-id": 2,
            "field-id": 1000,
        }
    ]
    assert meta["last-partition-id"] == 1000
    # the data files physically OMIT the partition column
    import pyarrow.parquet as pq

    ddir = os.path.join(tbl, "data")
    for n in os.listdir(ddir):
        assert "bucket" not in pq.read_schema(
            os.path.join(ddir, n)
        ).names
    # read path 1: read_iceberg injects the values back
    got = {
        (r.id, r.bucket, r.s)
        for r in read_iceberg(spark, tbl).collect()
    }
    assert got == {(i, i % 3, f"s{i}") for i in range(12)}
    # read path 2: the registered pyiceberg format
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    got2 = {
        (r.id, r.bucket, r.s)
        for r in spark.read.format("pyiceberg").load(tbl).collect()
    }
    assert got2 == got


def test_partitioned_pruning_and_filters(spark, tbl):
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(40)], "id long, p int"
    )
    write_iceberg(spark, df, tbl, mode="create", partition_by=["p"])
    meta = table_metadata(tbl)
    snap = iceberg_py._select_snapshot(meta)
    data, _pos, _eq = iceberg_py._snapshot_files(meta, snap, tbl)
    assert len(data) >= 4  # at least one file per partition value
    schema_obj = iceberg_py._current_schema(meta)
    kept = iceberg_py.prune_data_files(data, schema_obj, [("p", "=", 2)])
    assert 0 < len(kept) < len(data)
    assert all(d["_idpart"][2] == 2 for d in kept)
    # end to end: filtered read returns exactly partition 2
    out = read_iceberg(spark, tbl, filters=[("p", "=", 2)])
    rows = out.filter("p = 2").collect()
    assert sorted(r.id for r in rows) == [i for i in range(40) if i % 4 == 2]
    # pyiceberg pushdown prunes partitions too
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    rd = pyiceberg_source._PyIcebergReader({"path": tbl})
    from pyspark.sql.datasource import EqualTo

    rd.pushFilters([EqualTo(("p",), 2)])
    assert rd._files_pruned >= 1


def test_partitioned_append_and_null_partition(spark, tbl):
    df = spark.createDataFrame(
        [(1, "us"), (2, "de")], "id long, region string"
    )
    write_iceberg(spark, df, tbl, mode="create", partition_by=["region"])
    write_iceberg(
        spark,
        spark.createDataFrame(
            [(3, "us"), (4, None)], "id long, region string"
        ),
        tbl,
        mode="append",
    )
    got = {(r.id, r.region) for r in read_iceberg(spark, tbl).collect()}
    assert got == {(1, "us"), (2, "de"), (3, "us"), (4, None)}
    # NULL-partition file prunes out of any comparison conjunct
    meta = table_metadata(tbl)
    data, _p, _e = iceberg_py._snapshot_files(
        meta, iceberg_py._select_snapshot(meta), tbl
    )
    kept = iceberg_py.prune_data_files(
        data, iceberg_py._current_schema(meta), [("region", "=", "us")]
    )
    assert all(d["_idpart"][2] == "us" for d in kept)
    # mismatched partition_by on append refuses
    with pytest.raises(UnsupportedOperationError, match="partition"):
        write_iceberg(
            spark,
            spark.createDataFrame([(9, "x")], "id long, region string"),
            tbl,
            mode="append",
            partition_by=["id"],
        )


def test_date_partitioned_table(spark, tbl):
    import datetime

    df = spark.createDataFrame(
        [
            (1, datetime.date(2024, 1, 1)),
            (2, datetime.date(2024, 1, 2)),
            (3, datetime.date(2024, 1, 1)),
        ],
        "id long, d date",
    )
    write_iceberg(spark, df, tbl, mode="create", partition_by=["d"])
    # values stored as days-from-epoch ints in the manifests
    meta = table_metadata(tbl)
    data, _p, _e = iceberg_py._snapshot_files(
        meta, iceberg_py._select_snapshot(meta), tbl
    )
    assert {d["_idpart"][2] for d in data} == {
        datetime.date(2024, 1, 1),
        datetime.date(2024, 1, 2),
    }
    got = {(r.id, r.d) for r in read_iceberg(spark, tbl).collect()}
    assert got == {
        (1, datetime.date(2024, 1, 1)),
        (2, datetime.date(2024, 1, 2)),
        (3, datetime.date(2024, 1, 1)),
    }
    kept = iceberg_py.prune_data_files(
        data,
        iceberg_py._current_schema(meta),
        [("d", "=", datetime.date(2024, 1, 2))],
    )
    assert len(kept) < len(data)
    # pyiceberg format reads dates injected from metadata too
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    got2 = {
        (r.id, r.d)
        for r in spark.read.format("pyiceberg").load(tbl).collect()
    }
    assert got2 == got


def test_partitioned_streaming_replay(spark, tbl, tmp_path):
    """The stream injects identity-partition constants per added
    file (values live only in metadata)."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    write_iceberg(
        spark,
        spark.createDataFrame([(1, "us"), (2, "de")], "id long, r string"),
        tbl,
        mode="create",
        partition_by=["r"],
    )
    first = table_metadata(tbl)["snapshots"][0]["snapshot-id"]
    write_iceberg(
        spark,
        spark.createDataFrame([(3, "fr")], "id long, r string"),
        tbl,
        mode="append",
    )
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("pyiceberg")
        .option("startingSnapshotId", first)
        .load(tbl)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.id, r.r) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "us"), (2, "de"), (3, "fr")}


def test_reads_foreign_format_version_1_table(spark, tbl, tmp_path):
    """Format-version 1 READ compat (round 9): a foreign v1 table —
    single ``schema`` key, ``partition-spec`` key, a snapshot whose
    manifests are an INLINE ``manifests`` path array (the spec's
    pre-manifest-list layout), and v1 manifest entries (no sequence
    numbers, no ``content`` field, required ``block_size_in_bytes``)
    — reads exactly; the v2-only write paths (append, position
    DELETE, compaction, expiration, streaming offsets) all refuse
    loudly instead of committing v2 constructs into a v1 table."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    os.makedirs(os.path.join(tbl, "metadata"), exist_ok=True)
    os.makedirs(os.path.join(tbl, "data"), exist_ok=True)
    df = spark.range(50).select(
        F.col("id").alias("a", metadata={"parquet.field.id": 1}),
        (F.col("id") * 2)
        .cast("string")
        .alias("b", metadata={"parquet.field.id": 2}),
    )
    tmp = str(tmp_path / "v1_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = next(
        os.path.join(root, n)
        for root, _d, names in os.walk(tmp)
        for n in sorted(names)
        if n.endswith(".parquet")
    )
    data_path = os.path.join(tbl, "data", f"{_uuid.uuid4().hex}.parquet")
    os.replace(src, data_path)

    v1_entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": "long", "field-id": 1},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {
                            "name": "file_path",
                            "type": "string",
                            "field-id": 100,
                        },
                        {
                            "name": "file_format",
                            "type": "string",
                            "field-id": 101,
                        },
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [],
                            },
                            "field-id": 102,
                        },
                        {
                            "name": "record_count",
                            "type": "long",
                            "field-id": 103,
                        },
                        {
                            "name": "file_size_in_bytes",
                            "type": "long",
                            "field-id": 104,
                        },
                        {
                            "name": "block_size_in_bytes",
                            "type": "long",
                            "field-id": 105,
                        },
                    ],
                },
                "field-id": 2,
            },
        ],
    }
    mpath = os.path.join(tbl, "metadata", "manifest-v1test.avro")
    avro_py.write_container(
        mpath,
        v1_entry_schema,
        iter(
            [
                (
                    1,
                    777,
                    (
                        data_path,
                        "PARQUET",
                        (),
                        50,
                        os.path.getsize(data_path),
                        67108864,
                    ),
                )
            ]
        ),
    )
    meta = {
        "format-version": 1,
        "table-uuid": str(_uuid.uuid4()),
        "location": tbl,
        "last-updated-ms": 1700000000000,
        "last-column-id": 2,
        "schema": {
            "type": "struct",
            "fields": [
                {"id": 1, "name": "a", "required": False, "type": "long"},
                {
                    "id": 2,
                    "name": "b",
                    "required": False,
                    "type": "string",
                },
            ],
        },
        "partition-spec": [],
        "properties": {},
        "current-snapshot-id": 777,
        "snapshots": [
            {
                "snapshot-id": 777,
                "timestamp-ms": 1700000000000,
                "manifests": [mpath],
            }
        ],
    }
    with open(
        os.path.join(tbl, "metadata", "v1.metadata.json"), "w"
    ) as fh:
        json.dump(meta, fh)
    with open(
        os.path.join(tbl, "metadata", "version-hint.text"), "w"
    ) as fh:
        fh.write("1")

    out = read_iceberg(spark, tbl)
    assert out.columns == ["a", "b"]
    rows = sorted(map(tuple, out.collect()))
    assert len(rows) == 50 and rows[0] == (0, "0") and rows[-1] == (
        49,
        "98",
    )

    # v2-only write/maintenance surfaces refuse loudly on v1
    with pytest.raises(UnsupportedOperationError):
        write_iceberg(
            spark, spark.range(1).select(F.col("id").alias("a")),
            tbl, mode="append",
        )
    with pytest.raises(UnsupportedOperationError):
        delete_iceberg_where(spark, tbl, "a = 1")
    with pytest.raises(UnsupportedOperationError):
        iceberg_py.compact_data_files(spark, tbl)
    with pytest.raises(UnsupportedOperationError):
        iceberg_py.expire_snapshots(tbl, retain_last=1)
    from local_lakehouse_spark.sources.pyiceberg_source import (
        _PyIcebergStreamReader,
    )

    with pytest.raises(UnsupportedOperationError):
        _PyIcebergStreamReader({"path": tbl}, None)

    # the registered batch DataSource reads v1 too
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    assert (
        spark.read.format("pyiceberg").load(tbl).count() == 50
    )


def test_name_mapping_binds_unstamped_files(spark, tbl):
    """``schema.name-mapping.default`` (spec "Column Projection"):
    data files WITHOUT parquet footer field ids — the add_files /
    migrated-table shape — bind by their MAPPED footer names. Staged
    by rewriting a committed file with different physical names
    (x, y) and no ids, then adding the mapping property. Both read
    paths must agree; a mapped field whose candidates all miss the
    file surfaces as NULL; a second stamped append mixes id-bound
    and name-mapped files in one scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    df = spark.range(20).select(
        F.col("id").alias("a"),
        (F.col("id") * 2).cast("string").alias("b"),
    )
    write_iceberg(spark, df.coalesce(1), tbl, mode="create")
    meta = table_metadata(tbl)
    snap = iceberg_py._select_snapshot(meta)
    data, _p, _e = iceberg_py._snapshot_files(meta, snap, tbl)
    assert len(data) == 1
    fpath = iceberg_py._resolve(data[0]["file_path"], tbl)
    t = pq.read_table(fpath)
    # physical names x/y, footer field ids stripped
    stripped = pa.table(
        {"x": t.column("a"), "y": t.column("b")}
    )
    pq.write_table(stripped, fpath)
    assert all(
        (f.metadata or {}).get(b"PARQUET:field_id") is None
        for f in pq.read_schema(fpath)
    )

    # without a mapping the id-bound scan cannot read the file
    with pytest.raises(Exception):
        read_iceberg(spark, tbl).collect()

    mf = iceberg_py._current_metadata_file(tbl)
    meta = json.load(open(mf))
    meta.setdefault("properties", {})[
        "schema.name-mapping.default"
    ] = json.dumps(
        [
            {"field-id": 1, "names": ["a", "x"]},
            {"field-id": 2, "names": ["b", "y"]},
        ]
    )
    json.dump(meta, open(mf, "w"))

    out = sorted(map(tuple, read_iceberg(spark, tbl).collect()))
    assert len(out) == 20 and out[0] == (0, "0") and out[-1] == (
        19,
        "38",
    )

    # mixed table: a stamped append unions with the mapped file
    write_iceberg(spark, df.limit(5).coalesce(1), tbl, mode="append")
    out2 = read_iceberg(spark, tbl)
    assert out2.count() == 25
    assert out2.filter("a = 3").count() == 2

    # the registered DataSource binds the same way (per-file mapped
    # names in the Arrow reader)
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    ds = spark.read.format("pyiceberg").load(tbl)
    assert ds.count() == 25
    assert sorted(map(tuple, ds.collect())) == sorted(
        map(tuple, out2.collect())
    )

    # a mapped field with no matching candidate surfaces as NULL
    # (re-resolve: the append committed a newer metadata.json)
    mf = iceberg_py._current_metadata_file(tbl)
    meta = json.load(open(mf))
    meta["properties"]["schema.name-mapping.default"] = json.dumps(
        [
            {"field-id": 1, "names": ["a", "x"]},
            {"field-id": 2, "names": ["zz"]},
        ]
    )
    json.dump(meta, open(mf, "w"))
    out3 = read_iceberg(spark, tbl)
    # unstamped file rows: b is NULL; stamped rows keep their ids
    assert out3.filter("b IS NULL").count() == 20
    assert out3.filter("b IS NOT NULL").count() == 5


def test_add_files_migration(spark, tbl, tmp_path):
    """``add_files`` (Iceberg's migration procedure): register
    existing parquet in place — zero rewrite, absolute paths, a
    name-mapping property for the unstamped footers, bounds from the
    source footers so migrated files prune like written ones."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("g")
    )
    raw = str(tmp_path / "raw")
    # Range-partition by k so the 4 migrated files carry DISJOINT k
    # bounds: round-robin repartition interleaves rows, leaving every
    # file spanning ~[0,99], and whether min/max pruning can then drop
    # a file depends on the session's core count (the bounds assert
    # below flapped when the test session's parallelism changed).
    df.repartitionByRange(4, F.col("k")).write.mode(
        "overwrite"
    ).parquet(raw)

    meta = iceberg_py.add_files(spark, tbl, raw)
    assert json.loads(
        meta["properties"]["schema.name-mapping.default"]
    )
    out = read_iceberg(spark, tbl)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, df.collect())
    )
    # the entries reference the ORIGINAL files (no copies made)
    snap = iceberg_py._select_snapshot(meta)
    data, _p, _e = iceberg_py._snapshot_files(meta, snap, tbl)
    assert all(d["file_path"].startswith(raw) for d in data)
    assert not os.path.isdir(os.path.join(tbl, "data"))

    # incremental add into the existing table
    raw2 = str(tmp_path / "raw2")
    df.limit(7).coalesce(1).write.mode("overwrite").parquet(raw2)
    iceberg_py.add_files(spark, tbl, raw2)
    assert read_iceberg(spark, tbl).count() == 107

    # migrated footers still feed scan planning
    meta = table_metadata(tbl)
    data, _p, _e = iceberg_py._snapshot_files(
        meta, iceberg_py._select_snapshot(meta), tbl
    )
    kept = iceberg_py.prune_data_files(
        data, iceberg_py._current_schema(meta), [("k", "=", 5)]
    )
    assert 0 < len(kept) < len(data)

    # a file sharing no columns with the schema refuses loudly
    alien = str(tmp_path / "alien")
    spark.range(3).select(F.col("id").alias("zz")).write.mode(
        "overwrite"
    ).parquet(alien)
    with pytest.raises(UnsupportedOperationError):
        iceberg_py.add_files(spark, tbl, alien)

    # the registered DataSource binds the mapped files too
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    assert spark.read.format("pyiceberg").load(tbl).count() == 107


def test_add_files_partitioned_refuses(spark, tbl, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    write_iceberg(spark, df, tbl, mode="create", partition_by=["g"])
    raw = str(tmp_path / "raw")
    df.write.mode("overwrite").parquet(raw)
    with pytest.raises(UnsupportedOperationError):
        iceberg_py.add_files(spark, tbl, raw)


def test_convert_delta_to_iceberg(spark, tbl, tmp_path):
    """Shallow Delta -> Iceberg CONVERT: metadata-only, hive
    partition values become identity metadata values (injected +
    pruned on read), name mapping binds the unstamped Delta parquet,
    and DV-bearing sources refuse through the reader-feature gate."""
    from pyspark.sql import functions as F

    from local_lakehouse_spark.sources import delta_py

    df = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") * 1.5).alias("v"),
    )
    dsrc = str(tmp_path / "delta_p")
    delta_py.write_delta(spark, df, dsrc, partition_by=["g"])
    iceberg_py.convert_delta_to_iceberg(spark, dsrc, tbl)

    out = read_iceberg(spark, tbl)
    assert sorted(map(tuple, out.select("k", "g", "v").collect())) == (
        sorted(map(tuple, df.collect()))
    )
    # partition values are metadata-only identity values that prune
    meta = table_metadata(tbl)
    spec = iceberg_py._partition_specs(meta)[0]
    assert [(f["name"], f["transform"]) for f in spec] == [
        ("g", "identity")
    ]
    data, _p, _e = iceberg_py._snapshot_files(
        meta, iceberg_py._select_snapshot(meta), tbl
    )
    kept = iceberg_py.prune_data_files(
        data, iceberg_py._current_schema(meta), [("g", "=", 2)]
    )
    assert 0 < len(kept) < len(data)
    n = (
        read_iceberg(spark, tbl, filters=[("g", "=", 2)])
        .filter("g = 2")
        .count()
    )
    assert n == df.filter("g = 2").count() > 0

    # no data copied: zero parquet under the iceberg location
    assert not os.path.isdir(os.path.join(tbl, "data"))

    # refusals: existing target, DV-bearing source
    with pytest.raises(UnsupportedOperationError):
        iceberg_py.convert_delta_to_iceberg(spark, dsrc, tbl)
    dsrc2 = str(tmp_path / "delta_dv")
    delta_py.write_delta(spark, df.drop("g"), dsrc2)
    delta_py.delete_where(spark, dsrc2, "k < 10")
    with pytest.raises(UnsupportedOperationError):
        iceberg_py.convert_delta_to_iceberg(
            spark, dsrc2, str(tmp_path / "ice2")
        )


def test_partition_spec_evolution_mixed_read(spark, tbl):
    """Partition-spec EVOLUTION (spec: specs are immutable, tables
    evolve by ADDING a spec and flipping default-spec-id): a table
    created identity-partitioned on g (spec 0, column omitted from
    the data files) evolves to UNPARTITIONED (spec 1); the next
    append stamps spec 1 in its manifest row and stores g physically.
    A read over the mixed manifests must inject g from metadata for
    spec-0 files AND read it physically from spec-1 files; pruning
    uses identity values for the old files and column bounds for the
    new."""
    from pyspark.sql import functions as F

    df = spark.range(60).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    write_iceberg(spark, df, tbl, mode="create", partition_by=["g"])

    # evolve: add spec 1 (unpartitioned), make it the default
    mf = iceberg_py._current_metadata_file(tbl)
    meta = json.load(open(mf))
    meta["partition-specs"] = list(meta["partition-specs"]) + [
        {"spec-id": 1, "fields": []}
    ]
    meta["default-spec-id"] = 1
    json.dump(meta, open(mf, "w"))

    extra = spark.range(60, 90).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    write_iceberg(spark, extra.coalesce(1), tbl, mode="append")

    meta = table_metadata(tbl)
    snap = iceberg_py._select_snapshot(meta)
    rows = iceberg_py._manifest_list_rows(snap, tbl)
    assert sorted(
        {int(r.get("partition_spec_id") or 0) for r in rows}
    ) == [0, 1]
    data, _p, _e = iceberg_py._snapshot_files(meta, snap, tbl)
    spec0 = [d for d in data if d.get("_idpart")]
    spec1 = [d for d in data if not d.get("_idpart")]
    assert spec0 and spec1
    # spec-1 files physically carry g; spec-0 files don't
    import pyarrow.parquet as pq

    assert "g" in pq.read_schema(
        iceberg_py._resolve(spec1[0]["file_path"], tbl)
    ).names
    assert "g" not in pq.read_schema(
        iceberg_py._resolve(spec0[0]["file_path"], tbl)
    ).names

    out = read_iceberg(spark, tbl)
    expected = sorted(map(tuple, df.collect())) + sorted(
        map(tuple, extra.collect())
    )
    assert sorted(map(tuple, out.collect())) == sorted(expected)
    # pruning g=1: identity values prune old files, bounds the new
    kept = iceberg_py.prune_data_files(
        data, iceberg_py._current_schema(meta), [("g", "=", 1)]
    )
    assert all(
        d["_idpart"].get(2) == 1 for d in kept if d.get("_idpart")
    )
    assert len([d for d in kept if d.get("_idpart")]) < len(spec0)
    n = (
        read_iceberg(spark, tbl, filters=[("g", "=", 1)])
        .filter("g = 1")
        .count()
    )
    assert n == 30


def test_refs_branches_and_tags(spark, tbl):
    """Named refs (spec: the metadata ``refs`` map): every commit
    advances the ``main`` branch; a foreign tag pins its snapshot —
    readable by name on both paths and protected from expiration."""
    import time as _time

    from pyspark.sql import functions as F

    df = spark.range(10).select(F.col("id").alias("k"))
    write_iceberg(spark, df, tbl, mode="create")
    meta = table_metadata(tbl)
    first = meta["current-snapshot-id"]
    assert meta["refs"]["main"]["snapshot-id"] == first

    # a foreign writer tags the first snapshot
    mf = iceberg_py._current_metadata_file(tbl)
    meta = json.load(open(mf))
    meta["refs"]["v1.0"] = {"snapshot-id": first, "type": "tag"}
    json.dump(meta, open(mf, "w"))

    write_iceberg(
        spark,
        spark.range(10, 25).select(F.col("id").alias("k")),
        tbl,
        mode="append",
    )
    meta = table_metadata(tbl)
    assert meta["refs"]["main"]["snapshot-id"] == meta[
        "current-snapshot-id"
    ]
    assert meta["refs"]["v1.0"]["snapshot-id"] == first  # untouched

    assert read_iceberg(spark, tbl, ref="main").count() == 25
    assert read_iceberg(spark, tbl, ref="v1.0").count() == 10
    with pytest.raises(DoesNotExistError):
        read_iceberg(spark, tbl, ref="nope")

    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    assert (
        spark.read.format("pyiceberg")
        .option("ref", "v1.0")
        .load(tbl)
        .count()
        == 10
    )
    assert (
        spark.read.format("pyiceberg")
        .option("branch", "main")
        .load(tbl)
        .count()
        == 25
    )

    # expiration never drops a ref'd snapshot
    res = iceberg_py.expire_snapshots(
        tbl,
        older_than_ms=int(_time.time() * 1000) + 60_000,
        retain_last=1,
    )
    assert first not in res["expired"]
    assert read_iceberg(spark, tbl, ref="v1.0").count() == 10


def test_append_refuses_mismatched_column_types(spark, tbl):
    """A matching-name column with a DIFFERENT type must refuse at
    commit time: a long parquet column committed into an int schema
    field writes files the field-id-bound read cannot decode (the
    failure would otherwise surface as an Arrow cast error at READ
    time, far from the offending write)."""
    from pyspark.sql import functions as F

    write_iceberg(
        spark,
        spark.range(5).select(F.col("id").cast("int").alias("k")),
        tbl,
        mode="create",
    )
    with pytest.raises(UnsupportedOperationError, match="types"):
        write_iceberg(
            spark,
            spark.createDataFrame([(9_000_000_001,)], "k long"),
            tbl,
            mode="append",
        )
    # a correctly-typed append still lands
    write_iceberg(
        spark,
        spark.createDataFrame([(7,)], "k int"),
        tbl,
        mode="append",
    )
    assert read_iceberg(spark, tbl).count() == 6


def test_delete_on_metadata_only_partition_column(spark, tbl):
    """DELETE with a predicate on an identity partition column whose
    values live ONLY in manifest metadata (the y35 layout): the DML
    scan must inject the values first — without injection the
    predicate reads NULL and the delete silently no-ops (round-9
    regression test for exactly that bug)."""
    from pyspark.sql import functions as F

    df = spark.range(60).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    write_iceberg(spark, df, tbl, mode="create", partition_by=["g"])
    delete_iceberg_where(spark, tbl, "g = 1")
    out = read_iceberg(spark, tbl)
    assert out.count() == 40
    assert sorted(
        r.g for r in out.select("g").distinct().collect()
    ) == [0, 2]
    # non-partition predicates keep working alongside
    delete_iceberg_where(spark, tbl, "k < 6")
    assert read_iceberg(spark, tbl).count() == 36


def test_update_where_single_snapshot(spark, tbl):
    """UPDATE as ONE snapshot (operation 'overwrite'): matched rows'
    positions delete and their updated images append atomically;
    assignments evaluate against the ORIGINAL row simultaneously
    (swap works); rows whose assignment moves them across identity
    partitions land in the right partition."""
    from pyspark.sql import functions as F

    df = spark.range(60).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("g"),
    )
    write_iceberg(spark, df, tbl, mode="create", partition_by=["g"])
    iceberg_py.update_iceberg_where(
        spark, tbl, "g = 1", {"g": "2", "k": "k + 1000"}
    )
    out = read_iceberg(spark, tbl)
    assert out.count() == 60
    gs = {
        r.g: r.c
        for r in out.groupBy("g").agg(F.count("*").alias("c")).collect()
    }
    assert gs == {0: 20, 2: 40}
    assert out.filter("k >= 1000").count() == 20
    snaps = table_metadata(tbl)["snapshots"]
    assert [s["summary"]["operation"] for s in snaps] == [
        "append",
        "overwrite",
    ]

    # simultaneous-assignment semantics: a swap
    tbl2 = tbl + "_swap"
    write_iceberg(
        spark, spark.createDataFrame([(1, 2)], "a long, b long"), tbl2
    )
    iceberg_py.update_iceberg_where(
        spark, tbl2, "true", {"a": "b", "b": "a"}
    )
    r = read_iceberg(spark, tbl2).collect()[0]
    assert (r.a, r.b) == (2, 1)

    # unknown assignment column refuses
    with pytest.raises(UnsupportedOperationError, match="unknown"):
        iceberg_py.update_iceberg_where(spark, tbl2, "true", {"zz": "1"})


def test_overwrite_mode_replace_snapshot(spark, tbl):
    """write_iceberg(mode='overwrite'): the REPLACE shape — status=2
    removals preserving original sequence numbers (absorbed delete
    files retired in their own content=1 manifest), current read sees
    exactly the new frame, time travel sees the old, the streaming
    source fails-or-skips the snapshot, and expiration can then
    reclaim the replaced files."""
    from pyspark.sql import functions as F

    df = spark.range(50).select(F.col("id").alias("k"))
    write_iceberg(spark, df.repartition(3), tbl, mode="create")
    delete_iceberg_where(spark, tbl, "k < 10")
    pre = table_metadata(tbl)["current-snapshot-id"]
    new = spark.range(5).select((F.col("id") + 500).alias("k"))
    write_iceberg(spark, new.coalesce(1), tbl, mode="overwrite")

    out = read_iceberg(spark, tbl)
    assert sorted(r.k for r in out.collect()) == [500, 501, 502, 503, 504]
    assert read_iceberg(spark, tbl, snapshot_id=pre).count() == 40
    meta = table_metadata(tbl)
    assert meta["snapshots"][-1]["summary"]["operation"] == "overwrite"
    # no prior manifests carry forward: the live plan is 1 data file
    data, pos, _eq = iceberg_py._snapshot_files(
        meta, iceberg_py._select_snapshot(meta), tbl
    )
    assert len(data) == 1 and not pos

    # streaming must gate the overwrite snapshot
    from local_lakehouse_spark.sources.pyiceberg_source import (
        _PyIcebergStreamReader,
    )

    rd = _PyIcebergStreamReader(
        {
            "path": tbl,
            "startingsnapshotid": str(
                meta["snapshots"][0]["snapshot-id"]
            ),
        },
        None,
    )
    with pytest.raises(Exception, match="skipChangeCommits"):
        rd.partitions({"seq": 0}, {"seq": 99})

    # overwrite of a missing table IS the create
    tbl3 = tbl + "_fresh"
    write_iceberg(spark, new, tbl3, mode="overwrite")
    assert read_iceberg(spark, tbl3).count() == 5


def test_overwrite_iceberg_where_replacewhere(spark, tbl):
    """Filtered overwrite (Delta replaceWhere semantics) in ONE
    snapshot: rows matching the predicate become position deletes,
    the incoming df appends; untouched partitions keep their files."""
    from pyspark.sql import functions as F

    df = spark.range(30).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("g"),
        (F.col("id") * 2).alias("v"),
    )
    write_iceberg(spark, df, tbl, mode="create", partition_by=["g"])
    meta0 = table_metadata(tbl)
    snap0 = iceberg_py._select_snapshot(meta0)
    data0, _p, _e = iceberg_py._snapshot_files(meta0, snap0, tbl)

    new = spark.createDataFrame(
        [(1000, 1, -1), (1001, 1, -2)], "k long, g int, v long"
    )
    meta = iceberg_py.overwrite_iceberg_where(spark, tbl, "g = 1", new)

    out = read_iceberg(spark, tbl)
    assert out.filter("g = 1").count() == 2
    assert sorted(
        r.k for r in out.filter("g = 1").select("k").collect()
    ) == [1000, 1001]
    # untouched partitions fully intact
    assert out.filter("g != 1").count() == 20
    assert out.count() == 22

    # exactly ONE new snapshot; prior data files survive untouched
    assert len(meta["snapshots"]) == len(meta0["snapshots"]) + 1
    snap = iceberg_py._select_snapshot(meta)
    data, pos, _e = iceberg_py._snapshot_files(meta, snap, tbl)
    old_paths = {d["file_path"] for d in data0}
    assert old_paths <= {d["file_path"] for d in data}
    assert pos, "expected a position-delete file, not a rewrite"

    # time travel still sees the pre-overwrite image
    prev = read_iceberg(spark, tbl, snapshot_id=snap0["snapshot-id"])
    assert prev.count() == 30

    # constraint check: incoming rows must satisfy the predicate
    bad = spark.createDataFrame([(1, 2, 0)], "k long, g int, v long")
    with pytest.raises(UnsupportedOperationError, match="constraint"):
        iceberg_py.overwrite_iceberg_where(spark, tbl, "g = 1", bad)


def test_write_table_iceberg_replace_where(spark, unity, tmp_path):
    """client.write_table replaceWhere on an ICEBERG table routes to
    the filtered overwrite instead of silently nuking the table (the
    r9 ADVICE-high defect)."""
    from pyspark.sql import functions as F

    from local_lakehouse_spark.models import (
        FileType, Table, TableType, WriteMode,
    )
    from local_lakehouse_spark.types_map import (
        spark_schema_to_uc_columns,
    )

    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("g")
    )
    loc = str(tmp_path / "ice_rw")
    table = Table(
        name="ice_rw",
        catalog_name="unity",
        schema_name="default",
        table_type=TableType.EXTERNAL,
        file_type=FileType.ICEBERG,
        columns=spark_schema_to_uc_columns(df.schema),
        storage_location=loc,
    )
    unity.create_table(table)
    unity.write_table(
        df, "unity", "default", "ice_rw", mode=WriteMode.OVERWRITE
    )
    new = spark.createDataFrame([(100, 0), (102, 0)], "k long, g int")
    unity.write_table(
        new,
        "unity",
        "default",
        "ice_rw",
        mode=WriteMode.OVERWRITE,
        replace_where="g = 0",
    )
    out = read_iceberg(spark, loc)
    assert out.count() == 12  # 10 odd survivors + 2 replacements
    assert sorted(
        r.k for r in out.filter("g = 0").collect()
    ) == [100, 102]


def test_dml_refuses_colliding_basenames(spark, tbl, tmp_path):
    """The r9 ADVICE-medium corruption guard: an add_files-migrated
    table holding same-named files from different source dirs must
    REFUSE row-level DML (positions would map to the wrong file)."""
    from pyspark.sql import functions as F

    df = spark.range(10).select(F.col("id").alias("k"))
    for sub in ("a", "b"):
        d = str(tmp_path / sub)
        df.coalesce(1).write.mode("overwrite").parquet(d)
        # rename the part file to a fixed name so basenames collide
        part = [
            f for f in os.listdir(d) if f.endswith(".parquet")
        ][0]
        os.replace(
            os.path.join(d, part), os.path.join(d, "part-000.parquet")
        )
        for extra in os.listdir(d):
            if not extra.endswith(".parquet"):
                os.remove(os.path.join(d, extra))
        iceberg_py.add_files(spark, tbl, d)
    with pytest.raises(UnsupportedOperationError, match="basename"):
        delete_iceberg_where(spark, tbl, "k = 3")


def test_overwrite_removal_entries_carry_partitions(spark, tbl):
    """Spec-consistency for foreign readers that inspect DELETED
    entries: a full overwrite's status=2 removals must carry each
    removed file's ORIGINAL partition record (not all-null) and sit
    in manifests stamped with the entry's original spec-id."""
    from pyspark.sql import functions as F

    df = spark.range(12).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("g")
    )
    write_iceberg(spark, df, tbl, mode="create", partition_by=["g"])
    new = spark.createDataFrame([(99, 0)], "k long, g int")
    meta = write_iceberg(spark, new, tbl, mode="overwrite")

    snap = iceberg_py._select_snapshot(meta)
    deleted_parts = []
    for mf in iceberg_py._manifest_list_rows(snap, tbl):
        mpath = iceberg_py._resolve(mf["manifest_path"], tbl)
        for entry in iceberg_py._read_avro_dicts(mpath):
            if entry.get("status") != 2:
                continue
            part = entry["data_file"].get("partition")
            assert isinstance(part, dict) and "g" in part, part
            deleted_parts.append(part["g"])
            assert int(mf.get("partition_spec_id") or 0) == 0
    # every original partition value appears among the removals,
    # none of them null-padded away
    assert set(deleted_parts) == {0, 1, 2}
    assert None not in deleted_parts


def test_name_mapping_probe_cached(spark, tbl, tmp_path, monkeypatch):
    """Planning on a name-mapped (add_files-migrated) table must not
    re-read every data file's footer per query — probes are cached by
    (path, mtime, size, mapping digest)."""
    from pyspark.sql import functions as F
    import pyarrow.parquet as pq_mod

    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g")
    )
    raw = str(tmp_path / "raw")
    df.repartition(4).write.mode("overwrite").parquet(raw)
    iceberg_py.add_files(spark, tbl, raw)
    assert read_iceberg(spark, tbl).count() == 40  # warms the cache

    calls = {"n": 0}
    real = pq_mod.read_schema

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(pq_mod, "read_schema", counting)
    assert read_iceberg(spark, tbl).count() == 40
    assert calls["n"] == 0, f"{calls['n']} footer probes on a warm plan"


def test_equality_delete_write_and_upsert(spark, tbl):
    """Equality-delete WRITE (the y33 read contract's twin): a pure
    equality delete retires prior rows by key; a CDC-style upsert
    (delete + append in ONE snapshot, same sequence) replaces rows
    whose keys collide while the strict `<` sequence rule keeps the
    new images alive. Both read paths must agree."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k long, s string, v long",
    )
    write_iceberg(spark, df, tbl, mode="create")  # seq 1

    # pure equality delete of k in {2, 4}
    keys = spark.createDataFrame([(2,), (4,)], "k long")
    meta = iceberg_py.equality_delete_iceberg(spark, tbl, keys, ["k"])
    out = read_iceberg(spark, tbl)
    assert sorted(r.k for r in out.collect()) == [1, 3]

    # the delete file is content=2 with equality_ids, global partition
    snap = iceberg_py._select_snapshot(meta)
    _d, _p, eq = iceberg_py._snapshot_files(meta, snap, tbl)
    assert len(eq) == 1 and eq[0].get("equality_ids")

    # re-insert k=2 at a LATER sequence: must survive the old delete
    write_iceberg(
        spark,
        spark.createDataFrame([(2, "b2", 21)], "k long, s string, v long"),
        tbl,
        mode="append",
    )
    assert sorted(r.k for r in read_iceberg(spark, tbl).collect()) == [
        1, 2, 3,
    ]

    # CDC upsert: replace k=1, insert k=9 — one snapshot
    n_snaps = len(table_metadata(tbl)["snapshots"])
    up = spark.createDataFrame(
        [(1, "a2", 11), (9, "z", 90)], "k long, s string, v long"
    )
    meta = iceberg_py.upsert_iceberg_equality(spark, tbl, up, ["k"])
    assert len(meta["snapshots"]) == n_snaps + 1
    got = {
        r.k: (r.s, r.v) for r in read_iceberg(spark, tbl).collect()
    }
    assert got == {
        1: ("a2", 11),
        2: ("b2", 21),
        3: ("c", 30),
        9: ("z", 90),
    }

    # registered DataSource read path agrees
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    ds = {
        r.k: (r.s, r.v)
        for r in spark.read.format("pyiceberg").load(tbl).collect()
    }
    assert ds == got

    # unknown equality column refuses loudly
    with pytest.raises(UnsupportedOperationError):
        iceberg_py.equality_delete_iceberg(
            spark, tbl, spark.createDataFrame([(1,)], "zz long"), ["zz"]
        )


def test_equality_upsert_partitioned(spark, tbl):
    """Upsert over a partitioned table: new images land under the
    spec's hive layout; the global equality delete retires the old
    partitions' rows; time travel still sees the pre-upsert image."""
    from pyspark.sql import functions as F

    df = spark.range(20).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("g"),
        F.col("id").alias("v"),
    )
    write_iceberg(spark, df, tbl, mode="create", partition_by=["g"])
    snap0 = iceberg_py._select_snapshot(table_metadata(tbl))

    up = spark.createDataFrame(
        [(3, 3, 333), (100, 0, 100)], "k long, g int, v long"
    )
    iceberg_py.upsert_iceberg_equality(spark, tbl, up, ["k"])
    out = read_iceberg(spark, tbl)
    assert out.count() == 21
    assert out.filter("k = 3").collect()[0].v == 333
    assert out.filter("k = 100").collect()[0].g == 0
    prev = read_iceberg(
        spark, tbl, snapshot_id=snap0["snapshot-id"]
    )
    assert prev.count() == 20 and prev.filter("k = 3").collect()[0].v == 3


def test_partition_spec_evolution(spark, tbl):
    """evolve_iceberg_partition_spec: new default spec-id on a
    metadata-only commit; old files keep their spec; appends lay out
    by the new spec; pruning consults per-file specs; re-added
    (source, transform) pairs keep their original field id."""
    from pyspark.sql import functions as F

    df = spark.range(24).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("g"),
        (F.col("id") % 4).cast("int").alias("h"),
    )
    # coalesce: multi-row files so COLUMN BOUNDS straddle the probe
    # values — what's being tested is per-file-SPEC partition-record
    # pruning, not bounds pruning
    df = df.coalesce(1)
    write_iceberg(spark, df, tbl, mode="create", partition_by=["g"])
    meta = iceberg_py.evolve_iceberg_partition_spec(tbl, ["h"])
    assert meta["default-spec-id"] == 1
    assert len(meta["partition-specs"]) == 2
    # g's field keeps id 1000, h's is freshly allocated 1001
    assert meta["partition-specs"][1]["fields"][0]["field-id"] == 1001
    # NO new snapshot (metadata-only)
    assert len(meta["snapshots"]) == 1

    df2 = spark.range(24, 48).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("g"),
        (F.col("id") % 4).cast("int").alias("h"),
    ).coalesce(1)
    write_iceberg(spark, df2, tbl, mode="append")
    out = read_iceberg(spark, tbl)
    assert out.count() == 48
    assert sorted(r.k for r in out.filter("h = 1").collect()) == [
        i for i in range(48) if i % 4 == 1
    ]

    # per-file spec pruning: h=1 prunes ONLY the new-spec files; the
    # old-spec files (no h in their partition record) are all kept
    meta = table_metadata(tbl)
    snap = iceberg_py._select_snapshot(meta)
    data, _p, _e = iceberg_py._snapshot_files(meta, snap, tbl)
    old = [d for d in data if d["_spec_id"] == 0]
    new = [d for d in data if d["_spec_id"] == 1]
    assert old and new
    kept = iceberg_py.prune_data_files(
        data, iceberg_py._current_schema(meta), [("h", "=", 1)]
    )
    kept_paths = {d["file_path"] for d in kept}
    assert {d["file_path"] for d in old} <= kept_paths
    assert any(d["file_path"] not in kept_paths for d in new)
    # ... and g=2 prunes only old-spec files
    kept_g = iceberg_py.prune_data_files(
        data, iceberg_py._current_schema(meta), [("g", "=", 2)]
    )
    kept_g_paths = {d["file_path"] for d in kept_g}
    assert {d["file_path"] for d in new} <= kept_g_paths
    assert any(d["file_path"] not in kept_g_paths for d in old)

    # no-op: evolving to the current spec changes nothing
    v = meta["default-spec-id"]
    meta2 = iceberg_py.evolve_iceberg_partition_spec(tbl, ["h"])
    assert meta2["default-spec-id"] == v
    assert len(meta2["partition-specs"]) == 2

    # re-adding g reuses its ORIGINAL field id (1000)
    meta3 = iceberg_py.evolve_iceberg_partition_spec(tbl, ["g", "h"])
    fids = {
        f["name"]: f["field-id"]
        for f in meta3["partition-specs"][-1]["fields"]
    }
    assert fids == {"g": 1000, "h": 1001}

    # evolve to UNPARTITIONED; appends stop writing hive layout
    meta4 = iceberg_py.evolve_iceberg_partition_spec(tbl, [])
    assert meta4["partition-specs"][-1]["fields"] == []
    write_iceberg(
        spark,
        spark.createDataFrame([(99, 0, 0)], "k long, g int, h int"),
        tbl,
        mode="append",
    )
    assert read_iceberg(spark, tbl).count() == 49

    # both read paths agree across all four specs
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    assert (
        spark.read.format("pyiceberg").load(tbl).count() == 49
    )


def test_spec_evolution_transform_field(spark, tbl):
    """Evolution to a TRANSFORM spec (bucket) — appends derive the
    layout column, manifests stamp the new spec, transform pruning
    applies only to new-spec files."""
    from pyspark.sql import functions as F

    df = spark.range(16).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    write_iceberg(spark, df, tbl, mode="create")
    iceberg_py.evolve_iceberg_partition_spec(tbl, ["bucket(4, k)"])
    write_iceberg(
        spark,
        spark.range(16, 32).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        ),
        tbl,
        mode="append",
    )
    out = read_iceberg(spark, tbl)
    assert out.count() == 32
    assert out.filter("k = 20").count() == 1


def test_pyiceberg_changelog_stream(spark, tbl, tmp_path):
    """option('changelog','true'): appends replay as insert rows,
    row-level DML snapshots (position deletes + new images) replay as
    delete rows (victims materialized from the prior snapshot's
    files) plus insert rows, compaction emits nothing, all stamped
    with _change_type/_commit_snapshot_id/_commit_timestamp."""
    from pyspark.sql import functions as F

    from local_lakehouse_spark.sources import pyiceberg_source
    from local_lakehouse_spark.sources.iceberg_py import (
        update_iceberg_where,
    )

    pyiceberg_source.register(spark)
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(8)], "k long, v long"
    ).coalesce(2)
    write_iceberg(spark, df, tbl, mode="create")  # seq 1
    delete_iceberg_where(spark, tbl, "k IN (1, 5)")  # seq 2
    update_iceberg_where(spark, tbl, "k = 2", {"v": "999"})  # seq 3
    write_iceberg(  # seq 4
        spark,
        spark.createDataFrame([(100, 1000)], "k long, v long"),
        tbl,
        mode="append",
    )

    stream = (
        spark.readStream.format("pyiceberg")
        .option("changelog", "true")
        .option("startingSnapshotId",
                table_metadata(tbl)["snapshots"][0]["snapshot-id"])
        .load(tbl)
    )
    assert stream.columns[-3:] == [
        "_change_type", "_commit_snapshot_id", "_commit_timestamp",
    ]
    q = (
        stream.writeStream.format("memory")
        .queryName("ice_changelog")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    rows = spark.table("ice_changelog").collect()
    got = sorted((r._change_type, r.k, r.v) for r in rows)
    want = sorted(
        [("insert", i, i * 10) for i in range(8)]  # seq 1
        + [("delete", 1, 10), ("delete", 5, 50)]  # seq 2
        + [("delete", 2, 20), ("insert", 2, 999)]  # seq 3 update
        + [("insert", 100, 1000)]  # seq 4
    )
    assert got == want
    # snapshot ids stamp correctly per change
    snaps = table_metadata(tbl)["snapshots"]
    by_snap = {
        s["snapshot-id"]: i for i, s in enumerate(snaps)
    }
    for r in rows:
        idx = by_snap[r._commit_snapshot_id]
        if (r._change_type, r.k) == ("insert", 100):
            assert idx == 3
        if r._change_type == "delete" and r.k in (1, 5):
            assert idx == 1
        assert r._commit_timestamp is not None

    # compaction (replace) emits nothing
    iceberg_py.compact_data_files(spark, tbl)
    stream2 = (
        spark.readStream.format("pyiceberg")
        .option("changelog", "true")
        .load(tbl)
    )
    # default start = current sequence - nothing new afterwards
    q2 = (
        stream2.writeStream.format("memory")
        .queryName("ice_changelog2")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q2.awaitTermination()
    assert spark.table("ice_changelog2").count() == 0

    # BATCH changelog (create_changelog_view shape) over the same
    # range agrees with the stream row-for-row; compaction (the last
    # snapshot) contributes nothing
    batch = (
        spark.read.format("pyiceberg")
        .option("changelog", "true")
        .load(tbl)
    )
    got_b = sorted(
        (r._change_type, r.k, r.v) for r in batch.collect()
    )
    assert got_b == want
    # bounded range: endSnapshotId stops before the append
    snaps = table_metadata(tbl)["snapshots"]
    upto = (
        spark.read.format("pyiceberg")
        .option("changelog", "true")
        .option("endSnapshotId", snaps[2]["snapshot-id"])
        .load(tbl)
    )
    assert upto.count() == len(want) - 1  # minus the k=100 insert
    # startSnapshotId is exclusive
    tail = (
        spark.read.format("pyiceberg")
        .option("changelog", "true")
        .option("startSnapshotId", snaps[2]["snapshot-id"])
        .load(tbl)
    )
    assert sorted(
        (r._change_type, r.k) for r in tail.collect()
    ) == [("insert", 100)]
    # unknown snapshot id refuses loudly
    with pytest.raises(Exception, match="not a snapshot"):
        spark.read.format("pyiceberg").option(
            "changelog", "true"
        ).option("endSnapshotId", "12345").load(tbl).collect()


def test_pyiceberg_stream_sink_exactly_once(spark, tbl, tmp_path):
    """readStream(pyiceberg) -> writeStream(pyiceberg): each
    microbatch commits ONE append snapshot stamped with
    stream-app-id/stream-epoch-id; a full replay on a fresh
    checkpoint commits nothing new (the exactly-once marker skips
    it); files bind by footer field id like any written data file."""
    from pyspark.sql import functions as F

    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    src, dst = tbl, str(tmp_path / "dst_ice")
    first = None
    for i in range(3):
        meta = write_iceberg(
            spark,
            spark.range(i * 10, (i + 1) * 10).select(
                "id", F.lit(i).cast("long").alias("b")
            ),
            src,
            mode="create" if i == 0 else "append",
        )
        if first is None:
            first = meta["snapshots"][0]["snapshot-id"]

    def run(ckpt):
        q = (
            spark.readStream.format("pyiceberg")
            .option("startingSnapshotId", first)
            .load(src)
            .writeStream.format("pyiceberg")
            .option("path", dst)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .option("txnAppId", "test-ice-q")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ck1")
    assert read_iceberg(spark, dst).count() == 30
    run("ck2")  # fresh checkpoint: full replay must be a no-op
    assert read_iceberg(spark, dst).count() == 30
    # incremental continuation via the original checkpoint
    write_iceberg(
        spark,
        spark.range(100, 105).select(
            "id", F.lit(9).cast("long").alias("b")
        ),
        src,
        mode="append",
    )
    run("ck1")
    got = read_iceberg(spark, dst)
    assert got.count() == 35
    assert got.filter("b = 9").count() == 5
    # exactly one committed snapshot per non-skipped microbatch,
    # each stamped with the exactly-once markers
    meta = table_metadata(dst)
    snaps = meta["snapshots"]
    assert len(snaps) == 2
    for s in snaps:
        assert s["summary"]["stream-app-id"] == "test-ice-q"
        assert s["summary"]["operation"] == "append"
    # both read paths see the sink's field-id-stamped files
    assert (
        spark.read.format("pyiceberg").load(dst).count() == 35
    )

    # partitioned targets refuse (the spec layout needs write_iceberg)
    part_tbl = str(tmp_path / "dst_part")
    write_iceberg(
        spark,
        spark.range(4).select("id", (F.col("id") % 2).alias("b")),
        part_tbl,
        mode="create",
        partition_by=["b"],
    )
    q = (
        spark.readStream.format("pyiceberg")
        .option("startingSnapshotId", first)
        .load(src)
        .writeStream.format("pyiceberg")
        .option("path", part_tbl)
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="unpartitioned"):
        q.awaitTermination(120)
        raise RuntimeError("partitioned sink should have failed")


def test_compaction_removal_entries_carry_partitions(spark, tbl):
    """Compaction's status=2 removals carry original partition
    records under per-original-spec manifests (same spec rule as
    overwrite) — checked on a partitioned table."""
    from pyspark.sql import functions as F

    df = spark.range(9).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("g")
    )
    write_iceberg(spark, df, tbl, mode="create", partition_by=["g"])
    meta = iceberg_py.compact_data_files(spark, tbl)
    snap = iceberg_py._select_snapshot(meta)
    assert snap["summary"]["operation"] == "replace"
    deleted_parts = []
    for mf in iceberg_py._manifest_list_rows(snap, tbl):
        mpath = iceberg_py._resolve(mf["manifest_path"], tbl)
        for entry in iceberg_py._read_avro_dicts(mpath):
            if entry.get("status") != 2:
                continue
            part = entry["data_file"].get("partition")
            assert isinstance(part, dict) and part.get("g") is not None
            deleted_parts.append(part["g"])
    assert set(deleted_parts) == {0, 1, 2}
    # rows identical post-compaction
    assert read_iceberg(spark, tbl).count() == 9


def test_compaction_absorbs_equality_deletes(spark, tbl):
    """Compaction over an equality-delete table: live rows (equality
    applied) rewrite at the new sequence, ALL delete files retire
    (content preserved on the removal entries), and both read paths
    see identical rows afterwards — the y43 lifecycle's maintenance
    step."""
    from pyspark.sql import functions as F

    from local_lakehouse_spark.sources import pyiceberg_source

    df = spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "k long, v long"
    )
    write_iceberg(spark, df, tbl, mode="create")
    up = spark.createDataFrame([(3, 333), (20, 200)], "k long, v long")
    iceberg_py.upsert_iceberg_equality(spark, tbl, up, ["k"])
    want = {(r.k, r.v) for r in read_iceberg(spark, tbl).collect()}
    assert (3, 333) in want and (20, 200) in want and len(want) == 11

    meta = iceberg_py.compact_data_files(spark, tbl, target_num_files=2)
    snap = iceberg_py._select_snapshot(meta)
    assert snap["summary"]["operation"] == "replace"
    data, pos, eq = iceberg_py._snapshot_files(meta, snap, tbl)
    assert not pos and not eq, "delete files must be absorbed"
    got = {(r.k, r.v) for r in read_iceberg(spark, tbl).collect()}
    assert got == want
    pyiceberg_source.register(spark)
    assert {
        (r.k, r.v)
        for r in spark.read.format("pyiceberg").load(tbl).collect()
    } == want
    # the removal entries keep the equality files' content=2
    eq_removals = 0
    for mf in iceberg_py._manifest_list_rows(snap, tbl):
        for entry in iceberg_py._read_avro_dicts(
            iceberg_py._resolve(mf["manifest_path"], tbl)
        ):
            if (
                entry.get("status") == 2
                and int(entry["data_file"].get("content") or 0) == 2
            ):
                eq_removals += 1
    assert eq_removals == 1
    # post-compaction DML works again (the eq-delete refusal cleared)
    delete_iceberg_where(spark, tbl, "k = 20")
    assert read_iceberg(spark, tbl).count() == 10


def test_equality_delete_partition_scoped(spark, tbl):
    """Spec 'Scan Planning' rule: an equality-delete file committed
    WITH a partition record applies only to data files of that
    partition — a Flink-written scoped delete must not retire
    matching keys in other partitions. Both read paths."""
    from pyspark.sql import functions as F

    from local_lakehouse_spark.sources import pyiceberg_source

    df = spark.createDataFrame(
        [(1, 0), (2, 0), (1, 1), (2, 1)], "k long, g int"
    )
    write_iceberg(spark, df, tbl, mode="create", partition_by=["g"])
    # scoped delete of k=1 in partition g=0 only
    _commit_equality_delete(
        spark, tbl, [(1,)], "k long", eq_ids=[1],
        partition=(0,),
        partition_fields=[
            {"name": "g", "avro_type": "int", "field-id": 1000}
        ],
    )
    got = sorted((r.k, r.g) for r in read_iceberg(spark, tbl).collect())
    assert got == [(1, 1), (2, 0), (2, 1)], got
    pyiceberg_source.register(spark)
    assert sorted(
        (r.k, r.g)
        for r in spark.read.format("pyiceberg").load(tbl).collect()
    ) == got
    # a GLOBAL delete (empty partition record) still applies
    # table-wide: k=2 disappears from both partitions
    _commit_equality_delete(spark, tbl, [(2,)], "k long", eq_ids=[1])
    got = sorted((r.k, r.g) for r in read_iceberg(spark, tbl).collect())
    assert got == [(1, 1)], got
    assert sorted(
        (r.k, r.g)
        for r in spark.read.format("pyiceberg").load(tbl).collect()
    ) == got


def test_snapshot_lineage_and_metadata_log(spark, tbl):
    """Spec lineage fields: each snapshot records its
    parent-snapshot-id (absent on the first), and each metadata
    commit appends its predecessor file to metadata-log."""
    from pyspark.sql import functions as F

    df = spark.range(4).select(F.col("id").alias("k"))
    write_iceberg(spark, df, tbl, mode="create")
    write_iceberg(spark, df, tbl, mode="append")
    write_iceberg(spark, df, tbl, mode="append")
    meta = table_metadata(tbl)
    snaps = meta["snapshots"]
    assert "parent-snapshot-id" not in snaps[0]
    assert snaps[1]["parent-snapshot-id"] == snaps[0]["snapshot-id"]
    assert snaps[2]["parent-snapshot-id"] == snaps[1]["snapshot-id"]
    log = meta["metadata-log"]
    assert len(log) == 2  # v1 and v2 superseded
    for entry in log:
        assert os.path.exists(entry["metadata-file"])
        assert entry["timestamp-ms"] > 0
    # log timestamps are the superseded files' last-updated instants
    assert [e["timestamp-ms"] for e in log] == sorted(
        e["timestamp-ms"] for e in log
    )


def test_rollback_iceberg_metadata_only(spark, tbl, tmp_path):
    """rollback_to_snapshot: metadata-only RESTORE — no new snapshot,
    no rewrite; appends after the rollback carry the rolled-back
    state at a still-monotonic sequence; the stream never replays
    abandoned snapshots; rolling forward is possible."""
    from pyspark.sql import functions as F

    from local_lakehouse_spark.sources import pyiceberg_source

    df1 = spark.createDataFrame([(1,), (2,)], "k long")
    write_iceberg(spark, df1, tbl, mode="create")  # seq 1
    meta = table_metadata(tbl)
    s1 = meta["snapshots"][0]["snapshot-id"]
    write_iceberg(
        spark, spark.createDataFrame([(3,)], "k long"), tbl,
        mode="append",
    )  # seq 2
    s2 = table_metadata(tbl)["snapshots"][1]["snapshot-id"]

    meta = iceberg_py.rollback_iceberg(tbl, snapshot_id=s1)
    assert meta["current-snapshot-id"] == s1
    assert len(meta["snapshots"]) == 2  # no new snapshot committed
    assert sorted(r.k for r in read_iceberg(spark, tbl).collect()) == [1, 2]
    assert meta["refs"]["main"]["snapshot-id"] == s1

    # append after rollback: carries the rolled-back state, seq stays
    # monotonic (3 — never reuses the abandoned snapshot's 2)
    meta = write_iceberg(
        spark, spark.createDataFrame([(9,)], "k long"), tbl,
        mode="append",
    )
    cur = iceberg_py._select_snapshot(meta)
    assert int(cur["sequence-number"]) == 3
    assert cur["parent-snapshot-id"] == s1
    assert sorted(
        r.k for r in read_iceberg(spark, tbl).collect()
    ) == [1, 2, 9]

    # the stream (from the beginning) replays ONLY the ancestor
    # chain: seq1 insert + seq3 insert, never the abandoned k=3
    pyiceberg_source.register(spark)
    q = (
        spark.readStream.format("pyiceberg")
        .option("startingSnapshotId", s1)
        .load(tbl)
        .writeStream.format("memory")
        .queryName("ice_rollback_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    assert sorted(
        r.k for r in spark.table("ice_rollback_stream").collect()
    ) == [1, 2, 9]

    # roll FORWARD to the abandoned snapshot still works (retained)
    iceberg_py.rollback_iceberg(tbl, snapshot_id=s2)
    assert sorted(
        r.k for r in read_iceberg(spark, tbl).collect()
    ) == [1, 2, 3]


def test_restore_iceberg_via_client_sql(unity, spark, tmp_path):
    """RESTORE TABLE ... TO VERSION AS OF <snapshot-id> on an ICEBERG
    table routes to the metadata-only rollback."""
    from local_lakehouse_spark.models import FileType
    from local_lakehouse_spark.sources import iceberg_py

    def _loc(tp, name):
        return str(tp / name)

    df = spark.range(5).selectExpr("id AS k")
    loc = _loc(tmp_path, "ice_restore")
    unity.create_as_table(
        df, "unity", "default", "ice_restore",
        file_type=FileType.ICEBERG, location=loc,
    )
    s1 = iceberg_py.table_metadata(loc)["snapshots"][0]["snapshot-id"]
    unity.write_table(
        spark.range(5, 8).selectExpr("id AS k"),
        "unity", "default", "ice_restore", mode="APPEND",
    )
    assert unity.read_table(
        "unity", "default", "ice_restore"
    ).count() == 8
    n_snaps = len(iceberg_py.table_metadata(loc)["snapshots"])
    unity.sql(
        f"RESTORE TABLE unity.default.ice_restore "
        f"TO VERSION AS OF {s1}"
    )
    assert unity.read_table(
        "unity", "default", "ice_restore"
    ).count() == 5
    # metadata-only: same snapshot count, no rewrite
    assert len(
        iceberg_py.table_metadata(loc)["snapshots"]
    ) == n_snaps


def test_positional_dml_composes_with_equality_deletes(spark, tbl):
    """Positional DML over a CDC-upsert (equality-delete) table: the
    surviving-row universe excludes eq-deleted rows, so an UPDATE
    cannot resurrect them and a DELETE doesn't double-tombstone;
    sequence scoping keeps the newer upserted images alive."""
    from pyspark.sql import functions as F

    from local_lakehouse_spark.sources.iceberg_py import (
        update_iceberg_where,
    )

    df = spark.createDataFrame(
        [(i, i * 10) for i in range(6)], "k long, v long"
    )
    write_iceberg(spark, df, tbl, mode="create")  # seq 1
    # CDC upsert: replace k=2 (old image eq-deleted), insert k=9
    up = spark.createDataFrame([(2, 222), (9, 90)], "k long, v long")
    iceberg_py.upsert_iceberg_equality(spark, tbl, up, ["k"])  # seq 2
    # positional UPDATE over the whole table: must see the upserted
    # image of k=2 (222 -> 223), never resurrect the old 20
    update_iceberg_where(spark, tbl, "k = 2", {"v": "v + 1"})  # seq 3
    got = {(r.k, r.v) for r in read_iceberg(spark, tbl).collect()}
    assert got == {
        (0, 0), (1, 10), (2, 223), (3, 30), (4, 40), (5, 50), (9, 90),
    }, got
    # positional DELETE of an eq-survivor and an upserted row
    delete_iceberg_where(spark, tbl, "k IN (1, 9)")
    got = sorted(r.k for r in read_iceberg(spark, tbl).collect())
    assert got == [0, 2, 3, 4, 5]
    # both read paths agree at the end of the mixed lifecycle
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    assert sorted(
        r.k for r in spark.read.format("pyiceberg").load(tbl).collect()
    ) == got


def test_overwrite_absorbs_equality_deletes(spark, tbl):
    """Full-table OVERWRITE of a CDC-upsert table: every prior data
    file AND delete file (position + equality) retires — nothing
    dangles because nothing old survives; reads see exactly df."""
    df = spark.createDataFrame(
        [(i, i) for i in range(5)], "k long, v long"
    )
    write_iceberg(spark, df, tbl, mode="create")
    iceberg_py.upsert_iceberg_equality(
        spark,
        tbl,
        spark.createDataFrame([(1, 111)], "k long, v long"),
        ["k"],
    )
    new = spark.createDataFrame([(77, 7)], "k long, v long")
    meta = write_iceberg(spark, new, tbl, mode="overwrite")
    snap = iceberg_py._select_snapshot(meta)
    data, pos, eq = iceberg_py._snapshot_files(meta, snap, tbl)
    assert not pos and not eq
    assert [
        (r.k, r.v) for r in read_iceberg(spark, tbl).collect()
    ] == [(77, 7)]
    # pre-overwrite time travel still applies the equality delete
    prev = meta["snapshots"][-2]["snapshot-id"]
    got = {
        (r.k, r.v)
        for r in read_iceberg(spark, tbl, snapshot_id=prev).collect()
    }
    assert got == {(0, 0), (1, 111), (2, 2), (3, 3), (4, 4)}


def test_sorted_compaction_skip_pruning(spark, tbl):
    """compact_data_files(sort_by=...) — the OPTIMIZE-ZORDER analog:
    the rewrite range-partitions + sorts so files carry DISJOINT
    bounds on the sort prefix; a point predicate then prunes to
    exactly one file; the sort order commits into the metadata."""
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        (F.col("id") * 7919 % 1000).alias("k"),
        F.col("id").alias("v"),
    )
    write_iceberg(spark, df.repartition(8), tbl, mode="create")
    meta = iceberg_py.compact_data_files(
        spark, tbl, target_num_files=4, sort_by=["k"]
    )
    # metadata carries the committed order
    oid = meta["default-sort-order-id"]
    order = next(
        o for o in meta["sort-orders"] if o["order-id"] == oid
    )
    assert [f["source-id"] for f in order["fields"]] == [
        next(
            f["id"]
            for f in iceberg_py._current_schema(meta)["fields"]
            if f["name"] == "k"
        )
    ]
    snap = iceberg_py._select_snapshot(meta)
    data, _p, _e = iceberg_py._snapshot_files(meta, snap, tbl)
    assert len(data) == 4
    kept = iceberg_py.prune_data_files(
        data, iceberg_py._current_schema(meta), [("k", "=", 500)]
    )
    assert len(kept) == 1, f"disjoint bounds should keep 1, got {len(kept)}"
    # rows intact, read correct
    out = read_iceberg(spark, tbl)
    assert out.count() == 1000
    assert out.filter("k = 500").count() == df.filter(
        F.col("k") == 500
    ).count()
    # unknown sort column refuses
    with pytest.raises(UnsupportedOperationError, match="sort_by"):
        iceberg_py.compact_data_files(spark, tbl, sort_by=["zzz"])
    # re-sorting by the same columns reuses the order-id
    meta2 = iceberg_py.compact_data_files(
        spark, tbl, target_num_files=2, sort_by=["k"]
    )
    assert meta2["default-sort-order-id"] == oid
    assert len(meta2["sort-orders"]) == len(meta["sort-orders"])


def test_equality_delete_binds_by_footer_field_id(spark, tbl):
    """ADVICE r10: an equality-delete file's columns must bind by
    FOOTER FIELD ID like data files. Rename the equality column
    AFTER the delete was committed: the delete file stores the OLD
    physical name, and a name-bound read would surface all-NULL keys
    — with eqNullSafe matching that silently deletes every
    earlier-sequence NULL-keyed row instead of the intended ones."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "n")],
        "k long, s string",
    )
    write_iceberg(spark, df, tbl, mode="create")  # seq 1
    _commit_equality_delete(
        spark, tbl, [(2,)], "k long", eq_ids=[1]
    )  # seq 2: delete k=2 (file's physical column name is "k")
    # rename k -> key (same field id 1) via a new metadata version
    meta = json.load(open(os.path.join(tbl, "metadata", "v2.metadata.json")))
    meta["schemas"][0]["fields"][0]["name"] = "key"
    with open(
        os.path.join(tbl, "metadata", "v3.metadata.json"), "w"
    ) as fh:
        json.dump(meta, fh)
    with open(
        os.path.join(tbl, "metadata", "version-hint.text"), "w"
    ) as fh:
        fh.write("3")
    got = sorted(
        ((r.key, r.s) for r in read_iceberg(spark, tbl).collect()),
        key=lambda t: (t[0] is None, t[0]),
    )
    # k=2 deleted; the NULL-keyed row SURVIVES (it was never deleted)
    assert got == [(1, "a"), (3, "c"), (None, "n")]


def test_equality_delete_unstamped_footer_binds_by_name(spark, tbl):
    """A foreign equality-delete file whose footer carries NO field
    ids falls back to current-name binding (and applies); a delete
    whose column is genuinely absent refuses loudly instead of
    surfacing NULL keys."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import uuid as _uuid

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, s string"
    )
    write_iceberg(spark, df, tbl, mode="create")
    meta = table_metadata(tbl)
    # hand-stage a delete parquet WITHOUT footer field ids
    dest = os.path.join(
        tbl, "data", f"eqdel-plain-{_uuid.uuid4().hex[:8]}.parquet"
    )
    pq.write_table(pa.table({"k": pa.array([2], pa.int64())}), dest)
    seq = int(meta.get("last-sequence-number", 0)) + 1
    sid = iceberg_py._new_snapshot_id()
    mrow = iceberg_py._write_manifest(
        tbl,
        [
            {
                "file_path": dest,
                "record_count": 1,
                "file_size_in_bytes": os.path.getsize(dest),
                "partition": None,
            }
        ],
        sid,
        seq,
        content=2,
        equality_ids=[1],
    )
    prior = iceberg_py._prior_manifest_rows(meta, tbl)
    iceberg_py._commit_snapshot(
        tbl, meta, prior + [mrow["row"]], "delete", sid
    )
    got = sorted(
        (r.k, r.s) for r in read_iceberg(spark, tbl).collect()
    )
    assert got == [(1, "a"), (3, "c")]
    # rename k -> key: the unstamped delete file can no longer bind
    meta = table_metadata(tbl)
    v = int(
        open(os.path.join(tbl, "metadata", "version-hint.text")).read()
    )
    meta["schemas"][0]["fields"][0]["name"] = "key"
    with open(
        os.path.join(tbl, "metadata", f"v{v + 1}.metadata.json"), "w"
    ) as fh:
        json.dump(meta, fh)
    with open(
        os.path.join(tbl, "metadata", "version-hint.text"), "w"
    ) as fh:
        fh.write(str(v + 1))
    with pytest.raises(
        UnsupportedOperationError, match="no column for field id"
    ):
        read_iceberg(spark, tbl).collect()


def test_removal_entries_preserve_equality_ids(spark, tbl):
    """ADVICE r10: status=2 DELETED entries for retired
    equality-delete files must keep equality_ids (spec: required for
    content=2 entries) so foreign readers inspecting removal
    manifests see well-formed metadata."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, s string"
    )
    write_iceberg(spark, df, tbl, mode="create")
    _commit_equality_delete(spark, tbl, [(2,)], "k long", eq_ids=[1])
    iceberg_py.compact_data_files(spark, tbl)  # absorbs the delete
    meta = table_metadata(tbl)
    snap = iceberg_py._select_snapshot(meta)
    removed_eq = []
    for mf in iceberg_py._manifest_list_rows(snap, tbl):
        mpath = iceberg_py._resolve(mf["manifest_path"], tbl)
        for entry in iceberg_py._read_avro_dicts(mpath):
            d = entry["data_file"]
            if entry.get("status") == 2 and int(d.get("content") or 0) == 2:
                removed_eq.append(d)
    assert removed_eq, "compaction should retire the equality delete"
    for d in removed_eq:
        assert list(d.get("equality_ids") or []) == [1]


def test_stream_sink_epoch_survives_expire(spark, tbl, tmp_path):
    """ADVICE r10: the streaming sink's exactly-once high-water epoch
    persists as a TABLE PROPERTY, so expire_snapshots cannot erase it
    and a restarted query still skips the replayed microbatch."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    write_iceberg(spark, df, tbl, mode="create")
    src_dir = str(tmp_path / "src")
    spark.createDataFrame([(2, "b")], "k long, s string").write.json(
        src_dir
    )
    q = (
        spark.readStream.schema("k long, s string")
        .json(src_dir)
        .writeStream.format("pyiceberg")
        .option("path", tbl)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option("queryName", "epoch_prop_app")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    meta = table_metadata(tbl)
    props = meta.get("properties") or {}
    keys = [k for k in props if k.startswith("stream-epoch.")]
    assert keys, f"high-water property missing: {props}"
    assert int(props[keys[0]]) >= 0
    # churn + expire: the marker snapshot can be expired, the
    # property survives
    write_iceberg(
        spark,
        spark.createDataFrame([(3, "c")], "k long, s string"),
        tbl,
        mode="append",
    )
    import time as _time

    meta = iceberg_py.expire_snapshots(
        tbl, older_than_ms=int(_time.time() * 1000) + 10_000,
        retain_last=1,
    )
    assert not any(
        (s.get("summary") or {}).get("stream-app-id")
        for s in meta.get("snapshots") or []
    ), "marker snapshot should be expired in this scenario"
    props = (table_metadata(tbl).get("properties")) or {}
    assert any(k.startswith("stream-epoch.") for k in props)


def test_compaction_partitioned_writes_real_partition_records(
    spark, tbl
):
    """ADVICE r10: compaction under a partitioned default spec must
    write REAL manifest partition records so a later partition-scoped
    equality delete (Flink-style) matches the compacted files."""
    df = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, "x"), (3, 30, "y"), (4, 40, "y")],
        "k long, v long, p string",
    )
    write_iceberg(
        spark, df, tbl, mode="create", partition_by=["p"]
    )
    meta = iceberg_py.compact_data_files(spark, tbl, target_num_files=1)
    snap = iceberg_py._select_snapshot(meta)
    data, _pos, _eq = iceberg_py._snapshot_files(meta, snap, tbl)
    parts = sorted(
        (d.get("partition") or {}).get("p") for d in data
    )
    assert parts == ["x", "y"], f"real partition records, got {parts}"
    # a partition-scoped equality delete now matches the compacted
    # file for p='x' only
    spec_fields = iceberg_py._partition_specs(meta).get(
        int(meta.get("default-spec-id", 0))
    )
    pf = iceberg_py._pf_avro_for_spec(
        meta, int(meta.get("default-spec-id", 0))
    )
    assert spec_fields and pf
    _commit_equality_delete(
        spark,
        tbl,
        [(1,)],
        "k long",
        eq_ids=[1],
        partition=("x",),
        partition_fields=pf,
        spec_id=int(meta.get("default-spec-id", 0)),
    )
    got = sorted(
        (r.k, r.p) for r in read_iceberg(spark, tbl).collect()
    )
    assert got == [(2, "x"), (3, "y"), (4, "y")]


def test_v3_dv_delete_read_replace_timetravel(spark, tbl):
    """Iceberg v3 deletion vectors: upgrade, DV DELETE (Puffin blob,
    executor-built), read applies the bitmap; a second overlapping
    delete REPLACES the DV (union) leaving exactly one live DV per
    file; time travel sees each stage; upgrade refuses while parquet
    position-delete files live."""
    from local_lakehouse_spark.sources import iceberg_puffin

    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(10)], "id long, s string"
    ).coalesce(1)
    write_iceberg(spark, df, tbl, mode="create")
    meta = iceberg_py.upgrade_iceberg_to_v3(tbl)
    assert meta["format-version"] == 3
    iceberg_py.dv_delete_iceberg_where(spark, tbl, "id IN (2, 5)")
    got = sorted(r.id for r in read_iceberg(spark, tbl).collect())
    assert got == [0, 1, 3, 4, 6, 7, 8, 9]
    iceberg_py.dv_delete_iceberg_where(spark, tbl, "id = 7")
    got = sorted(r.id for r in read_iceberg(spark, tbl).collect())
    assert got == [0, 1, 3, 4, 6, 8, 9]
    meta = table_metadata(tbl)
    dvs = iceberg_py._live_dv_entries(meta, tbl)
    assert len(dvs) == 1
    d = next(iter(dvs.values()))
    assert int(d["record_count"]) == 3  # union of both deletes
    # Puffin footer coordinates match the manifest entry
    pf = iceberg_py._resolve(d["file_path"], tbl)
    ft = iceberg_puffin.read_puffin_footer(pf)
    assert ft["blobs"][0]["offset"] == int(d["content_offset"])
    assert ft["blobs"][0]["length"] == int(
        d["content_size_in_bytes"]
    )
    assert ft["blobs"][0]["type"] == "deletion-vector-v1"
    # time travel: each stage intact
    snaps = meta["snapshots"]
    assert sorted(
        r.id
        for r in read_iceberg(
            spark, tbl, snapshot_id=snaps[0]["snapshot-id"]
        ).collect()
    ) == list(range(10))
    assert sorted(
        r.id
        for r in read_iceberg(
            spark, tbl, snapshot_id=snaps[1]["snapshot-id"]
        ).collect()
    ) == [0, 1, 3, 4, 6, 7, 8, 9]
    # v2 DML refuses on v3; dv delete refuses on v2
    with pytest.raises(UnsupportedOperationError, match="format-version"):
        iceberg_py.delete_iceberg_where(spark, tbl, "id = 0")


def test_v3_upgrade_refuses_position_deletes(spark, tbl):
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(6)], "id long, s string"
    ).coalesce(1)
    write_iceberg(spark, df, tbl, mode="create")
    iceberg_py.delete_iceberg_where(spark, tbl, "id = 1")
    with pytest.raises(
        UnsupportedOperationError, match="position-delete"
    ):
        iceberg_py.upgrade_iceberg_to_v3(tbl)
    with pytest.raises(UnsupportedOperationError, match="format-version"):
        iceberg_py.dv_delete_iceberg_where(spark, tbl, "id = 2")
    # compaction absorbs the position deletes -> upgrade succeeds
    iceberg_py.compact_data_files(spark, tbl)
    meta = iceberg_py.upgrade_iceberg_to_v3(tbl)
    assert meta["format-version"] == 3
    iceberg_py.dv_delete_iceberg_where(spark, tbl, "id = 2")
    got = sorted(r.id for r in read_iceberg(spark, tbl).collect())
    assert got == [0, 3, 4, 5]


def test_v3_dv_pyiceberg_source_and_changelog(spark, tbl, tmp_path):
    """The registered pyiceberg DataSource applies v3 DVs per task;
    the batch AND streaming changelogs reconstruct per-snapshot
    victims from DV diffs (new blob minus the file's prior blob)."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(10)], "id long, s string"
    ).coalesce(1)
    write_iceberg(spark, df, tbl, mode="create")
    iceberg_py.upgrade_iceberg_to_v3(tbl)
    iceberg_py.dv_delete_iceberg_where(spark, tbl, "id IN (2, 5)")
    iceberg_py.dv_delete_iceberg_where(spark, tbl, "id = 7")
    got = sorted(
        r.id
        for r in spark.read.format("pyiceberg").load(tbl).collect()
    )
    assert got == [0, 1, 3, 4, 6, 8, 9]
    cl = (
        spark.read.format("pyiceberg")
        .option("changelog", "true")
        .load(tbl)
    )
    rows = sorted((r.id, r._change_type) for r in cl.collect())
    assert [i for i, t_ in rows if t_ == "insert"] == list(range(10))
    assert sorted(i for i, t_ in rows if t_ == "delete") == [2, 5, 7]
    # stream == batch
    out = []
    q = (
        spark.readStream.format("pyiceberg")
        .option("changelog", "true")
        .option(
            "startingSnapshotId",
            table_metadata(tbl)["snapshots"][0]["snapshot-id"],
        )
        .load(tbl)
        .writeStream.foreachBatch(
            lambda bdf, _b: out.extend(
                (r.id, r._change_type) for r in bdf.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert sorted(out) == rows


def test_equality_delete_changelog_reconstructs_victims(
    spark, tbl, tmp_path
):
    """Equality-delete snapshots emit row-level changelog entries
    (r11): victims reconstruct per prior data file from the delete
    keysets — rows already dead at the prior snapshot never re-emit,
    and a key deleted after an upsert emits the UPSERTED image, not
    the original. Batch == stream; gross changes net to the state."""
    from collections import Counter

    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k long, v string"
    ).coalesce(1)
    write_iceberg(spark, base, tbl, mode="create")  # seq 1
    up = spark.createDataFrame(
        [(2, "V2"), (5, "V5"), (11, "v11")], "k long, v string"
    ).coalesce(1)
    iceberg_py.upsert_iceberg_equality(spark, tbl, up, ["k"])  # seq 2
    dead = spark.createDataFrame([(3,), (2,)], "k long")
    iceberg_py.equality_delete_iceberg(spark, tbl, dead, ["k"])  # seq 3
    state = sorted(
        (r.k, r.v) for r in read_iceberg(spark, tbl).collect()
    )
    cl = (
        spark.read.format("pyiceberg")
        .option("changelog", "true")
        .load(tbl)
    )
    rows = sorted(
        (r.k, r.v, r._change_type, r._commit_snapshot_id)
        for r in cl.collect()
    )
    ins = sorted((k, v) for k, v, t_, _s in rows if t_ == "insert")
    dels = sorted((k, v) for k, v, t_, _s in rows if t_ == "delete")
    assert ins == sorted(
        [(i, f"v{i}") for i in range(10)]
        + [(2, "V2"), (5, "V5"), (11, "v11")]
    )
    # seq 2 kills old images of 2 and 5; seq 3 kills v3 and the
    # UPSERTED V2 (old v2 is already dead — no double emit)
    assert dels == sorted(
        [(2, "v2"), (5, "v5"), (3, "v3"), (2, "V2")]
    )
    net = Counter(ins)
    net.subtract(Counter(dels))
    assert sorted(k for k, c in net.items() if c == 1) == state
    # stream agrees row-for-row
    out = []
    q = (
        spark.readStream.format("pyiceberg")
        .option("changelog", "true")
        .option(
            "startingSnapshotId",
            table_metadata(tbl)["snapshots"][0]["snapshot-id"],
        )
        .load(tbl)
        .writeStream.foreachBatch(
            lambda bdf, _b: out.extend(
                (r.k, r.v, r._change_type, r._commit_snapshot_id)
                for r in bdf.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert sorted(out) == rows
    # table_changes' net fast path now covers equality ranges: the
    # driver-side probe must NOT fall back (plan builds)
    parts = pyiceberg_source._PyIcebergChangelogBatchReader(
        {"path": tbl}
    ).partitions()
    assert "eqvictims" in [p.value.get("kind") for p in parts]


def test_equality_changelog_partition_scoped(spark, tbl, tmp_path):
    """A PARTITION-SCOPED equality delete's changelog victims stay
    inside the scoped partition — rows with matching keys in other
    partitions never emit as deletes."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    df = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, "x"), (1, 30, "y"), (2, 40, "y")],
        "k long, v long, p string",
    )
    write_iceberg(spark, df, tbl, mode="create", partition_by=["p"])
    meta = table_metadata(tbl)
    pf = iceberg_py._pf_avro_for_spec(
        meta, int(meta.get("default-spec-id", 0))
    )
    _commit_equality_delete(
        spark,
        tbl,
        [(1,)],
        "k long",
        eq_ids=[1],
        partition=("x",),
        partition_fields=pf,
        spec_id=int(meta.get("default-spec-id", 0)),
    )
    cl = (
        spark.read.format("pyiceberg")
        .option("changelog", "true")
        .load(tbl)
    )
    dels = sorted(
        (r.k, r.p)
        for r in cl.filter("_change_type = 'delete'").collect()
    )
    assert dels == [(1, "x")], dels


def test_wap_branch_write_audit_publish(spark, tbl):
    """WAP: an audit-branch append is invisible on main (both read
    paths) until fast_forward publishes it; a divergent fast-forward
    refuses; cherrypick_iceberg_snapshot publishes a divergent append
    branch, re-stamped at a new sequence; non-append snapshots refuse
    cherry-pick."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(5)], "k long, v string"
    ).coalesce(1)
    write_iceberg(spark, base, tbl, mode="create")
    iceberg_py.create_iceberg_branch(tbl, "audit")
    with pytest.raises(UnsupportedOperationError, match="already"):
        iceberg_py.create_iceberg_branch(tbl, "audit")
    staged = spark.createDataFrame(
        [(100, "s1"), (101, "s2")], "k long, v string"
    ).coalesce(1)
    iceberg_py.append_iceberg_branch(spark, staged, tbl, "audit")
    assert read_iceberg(spark, tbl).count() == 5
    assert spark.read.format("pyiceberg").load(tbl).count() == 5
    assert read_iceberg(spark, tbl, ref="audit").count() == 7
    # branch appends validate the schema like main appends
    with pytest.raises(UnsupportedOperationError, match="columns"):
        iceberg_py.append_iceberg_branch(
            spark,
            spark.createDataFrame([(1, 2)], "k long, zz long"),
            tbl,
            "audit",
        )
    iceberg_py.fast_forward_iceberg(tbl, "main", "audit")
    got = sorted(r.k for r in read_iceberg(spark, tbl).collect())
    assert got == [0, 1, 2, 3, 4, 100, 101]
    meta = table_metadata(tbl)
    assert (
        meta["refs"]["main"]["snapshot-id"]
        == meta["refs"]["audit"]["snapshot-id"]
        == meta["current-snapshot-id"]
    )
    # diverge: main advances, audit stages another append
    write_iceberg(
        spark,
        spark.createDataFrame([(200, "m")], "k long, v string"),
        tbl,
        mode="append",
    )
    iceberg_py.append_iceberg_branch(
        spark,
        spark.createDataFrame([(300, "a")], "k long, v string"),
        tbl,
        "audit",
    )
    with pytest.raises(
        UnsupportedOperationError, match="fast-forward"
    ):
        iceberg_py.fast_forward_iceberg(tbl, "main", "audit")
    audit_head = table_metadata(tbl)["refs"]["audit"]["snapshot-id"]
    meta = iceberg_py.cherrypick_iceberg_snapshot(tbl, audit_head)
    got = sorted(r.k for r in read_iceberg(spark, tbl).collect())
    assert got == [0, 1, 2, 3, 4, 100, 101, 200, 300]
    # the published snapshot is re-stamped at a NEW sequence
    assert int(meta["snapshots"][-1]["sequence-number"]) == int(
        meta["last-sequence-number"]
    )
    # re-publishing an already-published snapshot is a no-op
    n_snaps = len(meta["snapshots"])
    meta2 = iceberg_py.cherrypick_iceberg_snapshot(tbl, audit_head)
    assert len(meta2["snapshots"]) == n_snaps
    iceberg_py.delete_iceberg_where(spark, tbl, "k = 0")
    dsnap = table_metadata(tbl)["snapshots"][-1]["snapshot-id"]
    with pytest.raises(UnsupportedOperationError, match="append"):
        iceberg_py.cherrypick_iceberg_snapshot(tbl, dsnap)
    iceberg_py.drop_iceberg_ref(tbl, "audit")
    assert "audit" not in (table_metadata(tbl).get("refs") or {})
    with pytest.raises(UnsupportedOperationError, match="main"):
        iceberg_py.drop_iceberg_ref(tbl, "main")


def test_wap_branch_stream_isolation(spark, tbl, tmp_path):
    """A plain (replay) stream on main never surfaces audit-branch
    rows; after the fast-forward publish, a fresh batch sees them —
    and the published snapshot replays as a normal append."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).coalesce(1)
    write_iceberg(spark, base, tbl, mode="create")
    iceberg_py.create_iceberg_branch(tbl, "audit")
    iceberg_py.append_iceberg_branch(
        spark,
        spark.createDataFrame([(9, "z")], "k long, v string"),
        tbl,
        "audit",
    )

    def drain(ck):
        out = []
        q = (
            spark.readStream.format("pyiceberg")
            .option(
                "startingSnapshotId",
                table_metadata(tbl)["snapshots"][0]["snapshot-id"],
            )
            .load(tbl)
            .writeStream.foreachBatch(
                lambda bdf, _b: out.extend(
                    r.k for r in bdf.collect()
                )
            )
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(out)

    assert drain("pre") == [1, 2]  # staged row invisible on main
    iceberg_py.fast_forward_iceberg(tbl, "main", "audit")
    assert drain("post") == [1, 2, 9]


def test_mapped_prefix_zero_probe_reads(
    spark, tbl, tmp_path, monkeypatch
):
    """Migration-time prefix recording (r11): a fresh session's read
    of an add_files / convert table plans with ZERO per-file footer
    probes — the property survives sessions, unlike the in-process
    probe cache. Mixed stamped sources keep the probe fallback."""
    import pyarrow.parquet as _pq

    src_dir = tmp_path / "foreign"
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id long, s string"
    ).repartition(2).write.parquet(str(src_dir))
    iceberg_py.add_files(spark, tbl, str(src_dir))
    meta = table_metadata(tbl)
    rec = json.loads(
        (meta.get("properties") or {})[
            iceberg_py._MAPPED_PREFIXES_PROP
        ]
    )
    assert rec == [str(src_dir)]
    # simulate a fresh session: clear the in-process cache, count
    # footer probes during the read
    iceberg_py._PROBE_CACHE.clear()
    calls = {"n": 0}
    real = _pq.read_schema

    def counting(p, *a, **k):
        calls["n"] += 1
        return real(p, *a, **k)

    monkeypatch.setattr(_pq, "read_schema", counting)
    got = sorted(
        (r.id, r.s) for r in read_iceberg(spark, tbl).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    assert calls["n"] == 0, f"{calls['n']} footer probes on read"
    monkeypatch.undo()
    # a rename still resolves through the mapping's candidate name
    v = int(
        open(os.path.join(tbl, "metadata", "version-hint.text")).read()
    )
    meta = table_metadata(tbl)
    meta["schemas"][0]["fields"][1]["name"] = "label"
    with open(
        os.path.join(tbl, "metadata", f"v{v + 1}.metadata.json"), "w"
    ) as fh:
        json.dump(meta, fh)
    with open(
        os.path.join(tbl, "metadata", "version-hint.text"), "w"
    ) as fh:
        fh.write(str(v + 1))
    out = read_iceberg(spark, tbl)
    assert out.columns == ["id", "label"]
    assert sorted(r.label for r in out.collect()) == [
        "a", "b", "c", "d",
    ]


def test_mapped_prefix_skipped_for_stamped_sources(
    spark, tbl, tmp_path
):
    """add_files over field-id-STAMPED parquet must NOT record the
    prefix — those files bind by id through the probe."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    src_dir = tmp_path / "stamped"
    os.makedirs(src_dir)
    fld = [
        pa.field(
            "id", pa.int64(), metadata={b"PARQUET:field_id": b"1"}
        ),
        pa.field(
            "s", pa.string(), metadata={b"PARQUET:field_id": b"2"}
        ),
    ]
    _pq.write_table(
        pa.table(
            {"id": pa.array([7], pa.int64()), "s": ["x"]},
            schema=pa.schema(fld),
        ),
        str(src_dir / "f.parquet"),
    )
    iceberg_py.add_files(spark, tbl, str(src_dir))
    props = table_metadata(tbl).get("properties") or {}
    assert iceberg_py._MAPPED_PREFIXES_PROP not in props
    assert sorted(
        (r.id, r.s) for r in read_iceberg(spark, tbl).collect()
    ) == [(7, "x")]


def test_wap_client_and_sql_surface(unity, spark, tmp_path):
    """Client facade + SQL DDL for WAP: CREATE BRANCH, branch write,
    FAST FORWARD publish, DROP BRANCH — the iceberg-spark procedures
    driven through the same dispatcher as the other maintenance
    SQL."""
    loc = str(tmp_path / "wap_sql")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    )
    write_iceberg(spark, base, loc, mode="create")
    unity.register_as_table("unity", "default", "wap", "ICEBERG", loc)
    unity.sql("ALTER TABLE unity.default.wap CREATE BRANCH audit")
    unity.write_table_branch(
        spark.createDataFrame([(9, "z")], "k long, v string"),
        "unity",
        "default",
        "wap",
        "audit",
    )
    assert unity.read_table("unity", "default", "wap").count() == 2
    unity.sql(
        "ALTER TABLE unity.default.wap FAST FORWARD main TO audit"
    )
    assert unity.read_table("unity", "default", "wap").count() == 3
    unity.sql("ALTER TABLE unity.default.wap DROP BRANCH audit")
    assert "audit" not in (table_metadata(loc).get("refs") or {})
    # branch DDL refuses on non-Iceberg tables
    unity.create_as_table(
        base, "unity", "default", "plainp",
        file_type="PARQUET", location=str(tmp_path / "pq"),
    )
    with pytest.raises(UnsupportedOperationError, match="ICEBERG"):
        unity.sql(
            "ALTER TABLE unity.default.plainp CREATE BRANCH b"
        )


def test_wap_staged_commit_cherrypick(unity, spark, tmp_path):
    """wap.id staged commits (iceberg-spark's ``spark.wap.id`` shape,
    ref-LESS snapshots): invisible to current reads on both paths,
    to TIMESTAMP travel (snapshot-log resolution — the leak this
    round fixed), and to the changelog ancestry, until
    cherrypick_snapshot publishes them onto main re-stamped at a new
    sequence; duplicate wap.ids refuse; explicit snapshot-id travel
    still reaches the staged rows (audit readers)."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    loc = str(tmp_path / "wap_staged")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    write_iceberg(spark, base, loc, mode="create")
    unity.register_as_table(
        "unity", "default", "staged", "ICEBERG", loc
    )
    sid = unity.stage_write(
        spark.createDataFrame([(9, "z"), (10, "y")], "k long, v string"),
        "unity",
        "default",
        "staged",
        wap_id="audit-1",
    )
    meta = table_metadata(loc)
    staged_snap = meta["snapshots"][-1]
    assert int(staged_snap["snapshot-id"]) == sid
    assert staged_snap["summary"]["wap.id"] == "audit-1"
    # ref-less: no ref points at it, main untouched
    assert sid not in {
        int(r["snapshot-id"]) for r in meta["refs"].values()
    }
    assert int(meta["current-snapshot-id"]) != sid
    # invisible: current reads (both paths), timestamp travel, and
    # the changelog ancestry
    assert read_iceberg(spark, loc).count() == 3
    assert spark.read.format("pyiceberg").load(loc).count() == 3
    future = int(staged_snap["timestamp-ms"]) + 10_000
    assert read_iceberg(spark, loc, timestamp_ms=future).count() == 3
    anc = iceberg_py.current_ancestors(meta)
    assert anc is not None and sid not in anc
    # audit readers reach it explicitly by snapshot id — a staged
    # snapshot is a full table state (parent rows + staged rows)
    assert read_iceberg(spark, loc, snapshot_id=sid).count() == 5
    with pytest.raises(UnsupportedOperationError, match="already"):
        iceberg_py.stage_iceberg_append(
            spark,
            spark.createDataFrame([(11, "x")], "k long, v string"),
            loc,
            "audit-1",
        )
    # publish: cherry-pick onto main, re-stamped at a new sequence
    unity.cherrypick_snapshot("unity", "default", "staged", sid)
    meta = table_metadata(loc)
    pub = meta["snapshots"][-1]
    assert pub["summary"]["published-wap-id"] == str(sid)
    assert int(pub["sequence-number"]) == int(
        meta["last-sequence-number"]
    ) and int(pub["sequence-number"]) > int(
        staged_snap["sequence-number"]
    )
    got = sorted(r.k for r in read_iceberg(spark, loc).collect())
    assert got == [1, 2, 3, 9, 10]
    assert read_iceberg(spark, loc, timestamp_ms=future + 20_000).count() == 5
    # idempotent republish
    n = len(meta["snapshots"])
    assert len(
        iceberg_py.cherrypick_iceberg_snapshot(loc, sid)["snapshots"]
    ) == n


def test_iceberg_tag_ddl_and_immutability(unity, spark, tmp_path):
    """CREATE/DROP TAG SQL + client facade: tags resolve via VERSION
    AS OF name, stay pinned while main advances, refuse writes/moves
    (append, fast-forward), and kind-checked DROP refuses the wrong
    keyword (iceberg-spark parity)."""
    loc = str(tmp_path / "tags")
    write_iceberg(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        loc,
        mode="create",
    )
    v1 = int(table_metadata(loc)["current-snapshot-id"])
    unity.register_as_table("unity", "default", "tagd", "ICEBERG", loc)
    unity.sql(
        f"ALTER TABLE unity.default.tagd CREATE TAG rel_v1 "
        f"AS OF VERSION {v1}"
    )
    write_iceberg(
        spark,
        spark.createDataFrame([(3, "c")], "k long, v string"),
        loc,
        mode="append",
    )
    meta = table_metadata(loc)
    assert meta["refs"]["rel_v1"] == {
        "snapshot-id": v1, "type": "tag",
    }
    assert read_iceberg(spark, loc, ref="rel_v1").count() == 2
    assert read_iceberg(spark, loc).count() == 3
    # immutable: no branch-append, no fast-forward onto a tag
    with pytest.raises(UnsupportedOperationError, match="branch"):
        iceberg_py.append_iceberg_branch(
            spark,
            spark.createDataFrame([(4, "d")], "k long, v string"),
            loc,
            "rel_v1",
        )
    with pytest.raises(UnsupportedOperationError, match="tag"):
        iceberg_py.fast_forward_iceberg(loc, "rel_v1", "main")
    # kind-checked DROP: BRANCH keyword on a tag refuses
    with pytest.raises(UnsupportedOperationError, match="not a"):
        unity.sql("ALTER TABLE unity.default.tagd DROP BRANCH rel_v1")
    unity.sql("ALTER TABLE unity.default.tagd DROP TAG rel_v1")
    assert "rel_v1" not in (table_metadata(loc).get("refs") or {})
    # client facade twin
    unity.create_tag("unity", "default", "tagd", "rel_v2")
    head = int(table_metadata(loc)["current-snapshot-id"])
    assert table_metadata(loc)["refs"]["rel_v2"] == {
        "snapshot-id": head, "type": "tag",
    }
    unity.drop_tag("unity", "default", "tagd", "rel_v2")
    assert "rel_v2" not in (table_metadata(loc).get("refs") or {})


def test_metadata_tables(unity, spark, tmp_path):
    """Iceberg inspection tables (metadata_table + the pyiceberg
    DataSource ``metadata`` option + client facade): snapshots /
    history / refs / manifests / files / delete_files / partitions
    over a partitioned table with a position delete and a tag;
    unknown kinds refuse; history excludes staged/branch snapshots
    (snapshot-log sourced)."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    loc = str(tmp_path / "mdt")
    write_iceberg(
        spark,
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "a")], "k long, g string"
        ).coalesce(1),
        loc,
        mode="create",
        partition_by=["g"],
    )
    write_iceberg(
        spark,
        spark.createDataFrame([(4, "c")], "k long, g string"),
        loc,
        mode="append",
    )
    delete_iceberg_where(spark, loc, "k = 1")
    iceberg_py.create_iceberg_tag(loc, "v1")
    meta = table_metadata(loc)

    snaps = iceberg_py.metadata_table(spark, loc, "snapshots")
    rows = snaps.orderBy("committed_at").collect()
    assert [r.operation for r in rows] == ["append", "append", "delete"]
    assert rows[1].parent_id == rows[0].snapshot_id
    assert rows[0]["summary"]["added-data-files"] == "2"

    hist = iceberg_py.metadata_table(spark, loc, "history").collect()
    assert len(hist) == 3 and all(r.is_current_ancestor for r in hist)
    # staged snapshots never enter history (snapshot-log sourced)
    iceberg_py.stage_iceberg_append(
        spark,
        spark.createDataFrame([(9, "z")], "k long, g string"),
        loc,
        "w1",
    )
    assert iceberg_py.metadata_table(spark, loc, "history").count() == 3
    assert iceberg_py.metadata_table(spark, loc, "snapshots").count() == 4

    refs = {
        (r.name, r.type, r.snapshot_id)
        for r in iceberg_py.metadata_table(spark, loc, "refs").collect()
    }
    cur = int(meta["current-snapshot-id"])
    assert refs == {("main", "branch", cur), ("v1", "tag", cur)}

    files = iceberg_py.metadata_table(spark, loc, "files").collect()
    assert len(files) == 3 and all(f.content == 0 for f in files)
    assert {f.partition["g"] for f in files} == {"a", "b", "c"}
    assert sum(f.record_count for f in files) == 4

    dels = iceberg_py.metadata_table(spark, loc, "delete_files").collect()
    assert len(dels) == 1 and dels[0].content == 1

    parts = {
        tuple(sorted(r.partition.items())): (
            r.record_count,
            r.file_count,
        )
        for r in iceberg_py.metadata_table(
            spark, loc, "partitions"
        ).collect()
        if r.file_count > 0
    }
    assert parts == {
        (("g", "a"),): (2, 1),
        (("g", "b"),): (1, 1),
        (("g", "c"),): (1, 1),
    }

    mans = iceberg_py.metadata_table(spark, loc, "manifests")
    assert mans.count() >= 3
    assert mans.where("content = 1").count() >= 1  # delete manifest

    # DataSource twin + snapshot pinning + client facade
    ds = (
        spark.read.format("pyiceberg")
        .option("metadata", "files")
        .load(loc)
    )
    assert sorted(r.file_path for r in ds.collect()) == sorted(
        f.file_path for f in files
    )
    first = int(meta["snapshots"][0]["snapshot-id"])
    pinned = iceberg_py.metadata_table(
        spark, loc, "files", snapshot_id=first
    )
    assert pinned.count() == 2
    unity.register_as_table("unity", "default", "mdt", "ICEBERG", loc)
    assert unity.metadata_table(
        "unity", "default", "mdt", "partitions"
    ).count() == len(parts) + 1  # + the unpartitioned delete-file row
    with pytest.raises(UnsupportedOperationError, match="metadata"):
        iceberg_py.metadata_table(spark, loc, "nope")


def test_v3_row_lineage(spark, tbl):
    """v3 row lineage: next-row-id / snapshot first-row-id /
    manifest-level first_row_id (field 520) with ADDED-entry
    inheritance; pre-upgrade files read _row_id NULL; carried
    manifests keep their assignment across later commits; DV deletes
    leave survivor ids untouched; v2 reads refuse row_lineage."""
    pre = spark.createDataFrame(
        [(100 + i, "pre") for i in range(3)], "k long, tag string"
    ).coalesce(1).sortWithinPartitions("k")
    write_iceberg(spark, pre, tbl, mode="create")
    with pytest.raises(UnsupportedOperationError, match="row_lineage"):
        read_iceberg(spark, tbl, row_lineage=True)
    iceberg_py.upgrade_iceberg_to_v3(tbl)
    a = spark.createDataFrame(
        [(i, "a") for i in range(5)], "k long, tag string"
    ).coalesce(1).sortWithinPartitions("k")
    write_iceberg(spark, a, tbl, mode="append")
    b = spark.createDataFrame(
        [(10 + i, "b") for i in range(4)], "k long, tag string"
    ).coalesce(1).sortWithinPartitions("k")
    write_iceberg(spark, b, tbl, mode="append")
    meta = table_metadata(tbl)
    assert int(meta["next-row-id"]) == 9
    assert [
        s.get("first-row-id") for s in meta["snapshots"]
    ] == [None, 0, 5]
    # manifest-list rows carry the assignment (spec field 520)
    mrows = iceberg_py._manifest_list_rows(
        iceberg_py._select_snapshot(meta), tbl
    )
    assert sorted(
        (r.get("first_row_id") for r in mrows),
        key=lambda v: (v is None, v),
    ) == [0, 5, None]
    got = {
        (r.k, r._row_id, r._last_updated_sequence_number)
        for r in read_iceberg(spark, tbl, row_lineage=True).collect()
    }
    assert got == (
        {(i, i, 2) for i in range(5)}
        | {(10 + i, 5 + i, 3) for i in range(4)}
        | {(100 + i, None, 1) for i in range(3)}
    )
    # DV delete: survivors keep ids
    iceberg_py.dv_delete_iceberg_where(spark, tbl, "k = 2")
    got2 = {
        (r.k, r._row_id)
        for r in read_iceberg(spark, tbl, row_lineage=True)
        .where("tag = 'a'")
        .collect()
    }
    assert got2 == {(0, 0), (1, 1), (3, 3), (4, 4)}
    # plain reads are untouched by the feature
    assert read_iceberg(spark, tbl).columns == ["k", "tag"]


def test_metadata_tables_sql_surface(unity, spark, tmp_path):
    """SQL references to metadata tables: FROM c.s.t.<kind>
    [VERSION AS OF n] resolve through the 4-part rewriter; unknown
    kinds and non-Iceberg tables are left untouched."""
    loc = str(tmp_path / "mdsql")
    write_iceberg(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        loc,
        mode="create",
    )
    first = int(table_metadata(loc)["current-snapshot-id"])
    write_iceberg(
        spark,
        spark.createDataFrame([(3, "c")], "k long, v string"),
        loc,
        mode="append",
    )
    unity.register_as_table("unity", "default", "mdsql", "ICEBERG", loc)
    rows = unity.sql(
        "SELECT snapshot_id, operation FROM unity.default.mdsql.snapshots "
        "ORDER BY committed_at"
    ).collect()
    assert len(rows) == 2 and rows[0].snapshot_id == first
    assert unity.sql(
        "SELECT * FROM unity.default.mdsql.files"
    ).count() == 3
    assert unity.sql(
        f"SELECT * FROM unity.default.mdsql.files VERSION AS OF {first}"
    ).count() == 2
    assert unity.sql(
        "SELECT name FROM unity.default.mdsql.refs"
    ).collect()[0].name == "main"


def test_v3_variant_type(spark, tbl):
    """Iceberg v3 VARIANT (round 12): a variant-typed column CREATES
    the table directly at format-version 3, stores the UNSHREDDED
    parquet variant group (footers stay pyarrow-readable — bounds /
    field-id probes keep working), binds by field id across RENAME,
    time-travels, composes with DV deletes, and the Arrow DataSource
    refuses it loudly."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    df = spark.range(0, 20).select(
        F.col("id").alias("k"),
        F.parse_json(
            F.concat(
                F.lit('{"a":'),
                F.col("id").cast("string"),
                F.lit("}"),
            )
        ).alias("doc"),
    )
    write_iceberg(spark, df.coalesce(1), tbl, mode="create")
    meta = table_metadata(tbl)
    assert int(meta["format-version"]) == 3
    assert "variant" in [
        f["type"] for f in iceberg_py._current_schema(meta)["fields"]
    ]
    # footers readable + id-stamped (the unshredded/unannotated
    # layout session.py pins)
    dfile = next(
        os.path.join(dp, f)
        for dp, _d, fs in os.walk(os.path.join(tbl, "data"))
        for f in fs
        if f.endswith(".parquet")
    )
    assert pq.read_schema(dfile) is not None
    assert iceberg_py._footer_field_ids(dfile)
    write_iceberg(
        spark,
        df.select((F.col("k") + 20).alias("k"), "doc").coalesce(1),
        tbl,
        mode="append",
    )
    out = read_iceberg(spark, tbl)
    assert (
        out.select(
            F.sum(F.variant_get("doc", "$.a", "long")).alias("s")
        ).collect()[0].s
        == sum(range(20)) * 2
    )
    iceberg_py.rename_iceberg_column(tbl, "doc", "payload")
    assert (
        read_iceberg(spark, tbl)
        .select(
            F.sum(F.variant_get("payload", "$.a", "long")).alias("s")
        )
        .collect()[0]
        .s
        == sum(range(20)) * 2
    )
    sid = int(meta["snapshots"][0]["snapshot-id"])
    assert read_iceberg(spark, tbl, snapshot_id=sid).count() == 20
    iceberg_py.dv_delete_iceberg_where(spark, tbl, "k % 4 = 0")
    assert read_iceberg(spark, tbl).count() == 30
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    with pytest.raises(Exception, match="variant"):
        spark.read.format("pyiceberg").load(tbl).count()


def test_v3_compaction_preserves_lineage(spark, tbl, tmp_path):
    """Lineage-preserving v3 compaction (round 12, the last v3 write
    gate): the rewrite materializes _row_id /
    _last_updated_sequence_number into the new parquet under the
    spec's reserved field ids (2147483540/2147483539), so survivor
    ids are BIT-IDENTICAL before and after across the unpartitioned,
    partitioned (_stage_data_files), and sort_by rewrite paths —
    with live deletion vectors absorbed in each."""
    from pyspark.sql import functions as F

    for variant in ("plain", "part", "sort"):
        loc = str(tmp_path / f"lin_{variant}")
        df = spark.range(0, 40).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("g")
        )
        if variant == "part":
            write_iceberg(
                spark, df, loc, mode="create", partition_by=["g"]
            )
        else:
            write_iceberg(
                spark,
                df.coalesce(1).sortWithinPartitions("k"),
                loc,
                mode="create",
            )
        iceberg_py.upgrade_iceberg_to_v3(loc)
        write_iceberg(
            spark,
            df.select((F.col("k") + 40).alias("k"), "g"),
            loc,
            mode="append",
        )
        iceberg_py.dv_delete_iceberg_where(spark, loc, "k % 5 = 0")
        known = {
            (r.k, r._row_id, r._last_updated_sequence_number)
            for r in iceberg_py.read_iceberg(
                spark, loc, row_lineage=True
            ).collect()
            if r._row_id is not None
        }
        assert known  # the append rows carry assigned ids
        kw = {"sort_by": ["k"]} if variant == "sort" else {}
        iceberg_py.compact_data_files(
            spark, loc, target_num_files=2, **kw
        )
        after = {
            (r.k, r._row_id, r._last_updated_sequence_number)
            for r in iceberg_py.read_iceberg(
                spark, loc, row_lineage=True
            ).collect()
        }
        assert known <= after, variant
        # reserved ids really are in the rewritten footers
        import pyarrow.parquet as pq

        ddir = os.path.join(loc, "data")
        mats = [
            p
            for p in (
                os.path.join(dp, f)
                for dp, _dn, fns in os.walk(ddir)
                for f in fns
                if f.endswith(".parquet")
            )
            if iceberg_py._ROW_ID_FIELD_ID
            in iceberg_py._footer_field_ids(p)
        ]
        assert mats, variant
        fs = pq.read_schema(mats[0])
        assert "_row_id" in fs.names


def test_v3_row_lineage_datasource_parity(spark, tbl, tmp_path):
    """The pyiceberg DataSource's rowLineage option matches
    read_iceberg(row_lineage=True) exactly (ids stamped before the
    per-task delete masks); v2 tables refuse the option."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    write_iceberg(
        spark,
        spark.createDataFrame(
            [(i, i % 3) for i in range(9)], "k long, g long"
        ).coalesce(1).sortWithinPartitions("k"),
        tbl,
        mode="create",
    )
    with pytest.raises(Exception, match="rowLineage|format-version"):
        spark.read.format("pyiceberg").option(
            "rowLineage", "true"
        ).load(tbl).collect()
    iceberg_py.upgrade_iceberg_to_v3(tbl)
    write_iceberg(
        spark,
        spark.createDataFrame(
            [(10 + i, 7) for i in range(4)], "k long, g long"
        ).coalesce(1).sortWithinPartitions("k"),
        tbl,
        mode="append",
    )
    iceberg_py.dv_delete_iceberg_where(spark, tbl, "k IN (11, 3)")
    jvm = read_iceberg(spark, tbl, row_lineage=True)
    ds = (
        spark.read.format("pyiceberg")
        .option("rowLineage", "true")
        .load(tbl)
    )
    assert jvm.exceptAll(ds).count() == 0
    assert ds.exceptAll(jvm).count() == 0
    got = {(r.k, r._row_id) for r in ds.collect()}
    # pre-upgrade rows NULL, post-upgrade 0..3 minus the DV victim
    assert got == {(i, None) for i in range(9) if i != 3} | {
        (10, 0), (12, 2), (13, 3),
    }


def test_metadata_tables_extended_kinds(spark, tbl, tmp_path):
    """entries / all_data_files / all_delete_files / all_manifests /
    position_deletes: statuses surface in entries; all_* union over
    retained snapshots (compacted-away files still visible);
    position_deletes reads parquet deletes distributed and decodes
    v3 DVs executor-side; the DataSource metadata option refuses the
    row-level kind."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(8)], "k long, g long"
    ).coalesce(1)
    write_iceberg(spark, df, tbl, mode="create", partition_by=["g"])
    delete_iceberg_where(spark, tbl, "k IN (1, 4)")
    ents = iceberg_py.metadata_table(spark, tbl, "entries").collect()
    assert {(e.status, e.content) for e in ents} == {(1, 0), (1, 1)}
    assert sum(e.record_count for e in ents if e.content == 0) == 8
    pdel = iceberg_py.metadata_table(
        spark, tbl, "position_deletes"
    ).collect()
    assert len(pdel) == 2 and {p.pos for p in pdel} <= {0, 1, 2, 3}
    assert all(
        p.delete_file_path.endswith(".parquet") for p in pdel
    )
    assert (
        iceberg_py.metadata_table(spark, tbl, "all_data_files").count()
        == 2
    )
    assert (
        iceberg_py.metadata_table(
            spark, tbl, "all_delete_files"
        ).count()
        == 1
    )
    assert (
        iceberg_py.metadata_table(spark, tbl, "all_manifests").count()
        == 2
    )
    with pytest.raises(Exception, match="position_deletes"):
        spark.read.format("pyiceberg").option(
            "metadata", "position_deletes"
        ).load(tbl).collect()

    # v3 DV flavor: DV positions surface with their Puffin path
    loc2 = str(tmp_path / "mdv")
    write_iceberg(spark, df, loc2, mode="create")
    iceberg_py.upgrade_iceberg_to_v3(loc2)
    iceberg_py.dv_delete_iceberg_where(spark, loc2, "k IN (2, 5)")
    dvp = iceberg_py.metadata_table(
        spark, loc2, "position_deletes"
    ).collect()
    assert {p.pos for p in dvp} == {2, 5}
    assert all(".puffin" in p.delete_file_path or "dv-" in
               p.delete_file_path for p in dvp)
    # all_data_files keeps files a later compaction retired (v2
    # table: compaction absorbs the position delete and rewrites)
    iceberg_py.compact_data_files(spark, tbl)
    assert (
        iceberg_py.metadata_table(spark, tbl, "files").count()
        < iceberg_py.metadata_table(
            spark, tbl, "all_data_files"
        ).count()
    )


def test_v3_default_values(unity, spark, tbl, tmp_path):
    """v3 initial-default / write-default: pre-evolution files read
    the initial default per FILE (footer field-id absence), appends
    omitting the column fill the write default, explicit NULLs stay
    NULL; both read paths agree; ADD COLUMN ... DEFAULT SQL sets
    both; guards refuse required-without-default on non-empty
    tables, defaults on v2, and staging NULLs into required
    columns."""
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    write_iceberg(
        spark,
        spark.createDataFrame([(1,), (2,)], "k long").coalesce(1),
        tbl,
        mode="create",
    )
    with pytest.raises(UnsupportedOperationError, match="format-version 3"):
        iceberg_py.add_iceberg_column(
            tbl, "tier", "string", initial_default="x"
        )
    iceberg_py.upgrade_iceberg_to_v3(tbl)
    with pytest.raises(UnsupportedOperationError, match="initial_default"):
        iceberg_py.add_iceberg_column(tbl, "m", "string", required=True)
    with pytest.raises(UnsupportedOperationError, match="unsupported"):
        iceberg_py.add_iceberg_column(
            tbl, "m", "date", initial_default="2026-01-01"
        )
    iceberg_py.add_iceberg_column(
        tbl,
        "tier",
        "string",
        initial_default="bronze",
        write_default="standard",
    )
    # metadata-only evolution: the new column shows on CURRENT reads
    # of both paths before any new snapshot exists
    assert read_iceberg(spark, tbl).columns == ["k", "tier"]
    assert spark.read.format("pyiceberg").load(tbl).columns == [
        "k", "tier",
    ]
    write_iceberg(
        spark, spark.createDataFrame([(3,)], "k long"), tbl,
        mode="append",
    )
    write_iceberg(
        spark,
        spark.createDataFrame(
            [(4, "gold"), (5, None)], "k long, tier string"
        ),
        tbl,
        mode="append",
    )
    want = [
        (1, "bronze"), (2, "bronze"), (3, "standard"),
        (4, "gold"), (5, None),
    ]
    assert sorted(
        (r.k, r.tier) for r in read_iceberg(spark, tbl).collect()
    ) == want
    assert sorted(
        (r.k, r.tier)
        for r in spark.read.format("pyiceberg").load(tbl).collect()
    ) == want
    # time travel to a pre-evolution snapshot: no phantom column
    first = int(table_metadata(tbl)["snapshots"][0]["snapshot-id"])
    assert read_iceberg(spark, tbl, snapshot_id=first).columns == ["k"]
    # required + defaults: NULL staging refuses from footer stats
    iceberg_py.add_iceberg_column(
        tbl, "grade", "long", required=True,
        initial_default=0, write_default=7,
    )
    with pytest.raises(UnsupportedOperationError, match="required"):
        write_iceberg(
            spark,
            spark.createDataFrame(
                [(9, "x", None)], "k long, tier string, grade long"
            ),
            tbl,
            mode="append",
        )
    write_iceberg(
        spark, spark.createDataFrame([(6,)], "k long"), tbl,
        mode="append",
    )
    got = {
        (r.k, r.grade) for r in read_iceberg(spark, tbl).collect()
    }
    assert (6, 7) in got and (1, 0) in got

    # SQL: ADD COLUMN ... DEFAULT sets both defaults
    loc = str(tmp_path / "addcol")
    write_iceberg(
        spark, spark.createDataFrame([(1,)], "k long").coalesce(1),
        loc, mode="create",
    )
    iceberg_py.upgrade_iceberg_to_v3(loc)
    unity.register_as_table("unity", "default", "addcol", "ICEBERG", loc)
    unity.sql(
        "ALTER TABLE unity.default.addcol "
        "ADD COLUMN score long DEFAULT 42"
    )
    f = [
        x
        for x in iceberg_py._current_schema(table_metadata(loc))["fields"]
        if x["name"] == "score"
    ][0]
    assert f["initial-default"] == 42 and f["write-default"] == 42
    assert unity.read_table("unity", "default", "addcol").collect()[
        0
    ].score == 42


def test_rename_drop_column(unity, spark, tbl, tmp_path):
    """RENAME/DROP COLUMN: metadata-only, field-id preserved on
    rename (existing files keep resolving — renames invisible to the
    id-bound scan); drop refuses partition-source and live-equality-
    delete fields; time travel keeps the old names; SQL surface."""
    write_iceberg(
        spark,
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k long, v string, w long"
        ).coalesce(1),
        tbl,
        mode="create",
        partition_by=["v"],
    )
    first = int(table_metadata(tbl)["current-snapshot-id"])
    old_fid = [
        f for f in iceberg_py._current_schema(table_metadata(tbl))["fields"]
        if f["name"] == "k"
    ][0]["id"]
    iceberg_py.rename_iceberg_column(tbl, "k", "key")
    meta = table_metadata(tbl)
    f = [
        x for x in iceberg_py._current_schema(meta)["fields"]
        if x["name"] == "key"
    ][0]
    assert f["id"] == old_fid  # id preserved
    got = sorted((r.key, r.v) for r in read_iceberg(spark, tbl).collect())
    assert got == [(1, "a"), (2, "b")]
    # time travel keeps the OLD name (snapshot schema-id binding)
    assert "k" in read_iceberg(spark, tbl, snapshot_id=first).columns
    with pytest.raises(UnsupportedOperationError, match="already"):
        iceberg_py.rename_iceberg_column(tbl, "v", "key")
    # drop: partition source refuses, plain column drops
    with pytest.raises(UnsupportedOperationError, match="partition"):
        iceberg_py.drop_iceberg_column(tbl, "v")
    iceberg_py.drop_iceberg_column(tbl, "w")
    assert read_iceberg(spark, tbl).columns == ["key", "v"]
    # appends after the drop: the physical column is simply absent
    write_iceberg(
        spark,
        spark.createDataFrame([(3, "c")], "key long, v string"),
        tbl,
        mode="append",
    )
    assert read_iceberg(spark, tbl).count() == 3
    # dropping a live equality delete's key column is LEGAL now
    # (round 12): the read resolves the dropped id against the
    # schema history and applies the delete on the values old data
    # files still store
    loc2 = str(tmp_path / "eqdrop")
    write_iceberg(
        spark,
        spark.createDataFrame(
            [(1, "x", 10), (2, "y", 20)], "id long, s string, w long"
        ).coalesce(1),
        loc2,
        mode="create",
    )
    iceberg_py.equality_delete_iceberg(
        spark,
        loc2,
        spark.createDataFrame([(1,)], "id long"),
        ["id"],
    )
    iceberg_py.drop_iceberg_column(loc2, "id")  # the eq KEY column
    assert [
        (r.s, r.w) for r in read_iceberg(spark, loc2).collect()
    ] == [("y", 20)]
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    assert [
        (r.s, r.w)
        for r in spark.read.format("pyiceberg").load(loc2).collect()
    ] == [("y", 20)]
    # SQL twins (on the eq table: s is a plain droppable column)
    unity.register_as_table("unity", "default", "rdc", "ICEBERG", loc2)
    unity.sql("ALTER TABLE unity.default.rdc RENAME COLUMN s TO txt")
    assert "txt" in unity.read_table("unity", "default", "rdc").columns
    unity.sql("ALTER TABLE unity.default.rdc DROP COLUMN txt")
    assert unity.read_table("unity", "default", "rdc").columns == [
        "w"
    ]


def test_v3_legal_ops_gate(spark, tbl, tmp_path):
    """v3 tables now accept the ops the v3 spec still permits —
    equality deletes/CDC upsert (the Flink shape), WAP staged
    commits, branch+tag lifecycle, overwrite, expire, and (round 12)
    lineage-preserving compaction — while parquet position-delete
    DML keeps refusing with a pointer to DVs."""
    write_iceberg(
        spark,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(6)], "k long, v string"
        ).coalesce(1),
        tbl,
        mode="create",
    )
    iceberg_py.upgrade_iceberg_to_v3(tbl)
    # equality upsert (CDC): delete-by-key + re-insert works on v3
    iceberg_py.upsert_iceberg_equality(
        spark,
        tbl,
        spark.createDataFrame(
            [(2, "UP2"), (99, "NEW")], "k long, v string"
        ),
        ["k"],
    )
    got = dict(
        (r.k, r.v) for r in read_iceberg(spark, tbl).collect()
    )
    assert got[2] == "UP2" and got[99] == "NEW" and len(got) == 7
    # the pyiceberg path agrees (equality + v3 in one table)
    from local_lakehouse_spark.sources import pyiceberg_source

    pyiceberg_source.register(spark)
    assert dict(
        (r.k, r.v)
        for r in spark.read.format("pyiceberg").load(tbl).collect()
    ) == got
    # DV delete composes with the equality delete
    iceberg_py.dv_delete_iceberg_where(spark, tbl, "k = 0")
    assert read_iceberg(spark, tbl).count() == 6
    # WAP on v3: stage + cherry-pick (fresh row ids at publish)
    meta = iceberg_py.stage_iceberg_append(
        spark,
        spark.createDataFrame([(50, "staged")], "k long, v string"),
        tbl,
        "w1",
    )
    sid = int(meta["snapshots"][-1]["snapshot-id"])
    assert read_iceberg(spark, tbl).count() == 6
    iceberg_py.cherrypick_iceberg_snapshot(tbl, sid)
    assert read_iceberg(spark, tbl).count() == 7
    meta = table_metadata(tbl)
    assert int(meta["snapshots"][-1]["first-row-id"]) >= 0
    # position-delete DML still refuses with the DV pointer class
    with pytest.raises(UnsupportedOperationError, match="v2"):
        delete_iceberg_where(spark, tbl, "k = 3")
    # v3 compaction preserves row lineage (round 12): survivors with
    # KNOWN lineage keep their (k, _row_id) across the rewrite;
    # pre-upgrade rows (NULL _row_id — the create predates the v3
    # upgrade) take fresh inherited ids, the spec's null rule; DV +
    # delete files retire
    before = {
        (r.k, r._row_id)
        for r in iceberg_py.read_iceberg(
            spark, tbl, row_lineage=True
        ).collect()
    }
    iceberg_py.compact_data_files(spark, tbl, target_num_files=1)
    after = {
        (r.k, r._row_id)
        for r in iceberg_py.read_iceberg(
            spark, tbl, row_lineage=True
        ).collect()
    }
    assert {kv for kv in after if kv in before} == {
        kv for kv in before if kv[1] is not None
    }
    assert {kv[0] for kv in after} == {kv[0] for kv in before}
    assert all(kv[1] is not None for kv in after)
    meta = table_metadata(tbl)
    snap = iceberg_py._select_snapshot(meta)
    d, p, e = iceberg_py._snapshot_files(meta, snap, tbl)
    assert len(d) == 1 and not p and not e
    # a post-compaction DV delete on the materialized file still
    # leaves survivors' ids untouched
    iceberg_py.dv_delete_iceberg_where(spark, tbl, "k = 2")
    assert {
        (r.k, r._row_id)
        for r in iceberg_py.read_iceberg(
            spark, tbl, row_lineage=True
        ).collect()
    } == {kv for kv in after if kv[0] != 2}
    # expire works on v3
    out = iceberg_py.expire_snapshots(tbl, retain_last=1)
    assert isinstance(out, dict)


def test_sort_orders(unity, spark, tbl):
    """Sort orders (spec sort-orders/default-sort-order-id):
    WRITE ORDERED BY records the order, subsequent writes cluster
    rows by it (near-disjoint file bounds -> scan planning prunes)
    and stamp sort_order_id (field 140) on the new entries; WRITE
    UNORDERED resets to order 0; reusing the same field list reuses
    the order id."""
    from pyspark.sql import functions as F

    write_iceberg(
        spark,
        spark.range(0).select(F.col("id").alias("k")),
        tbl,
        mode="create",
    )
    unity.register_as_table("unity", "default", "so", "ICEBERG", tbl)
    unity.sql(
        "ALTER TABLE unity.default.so WRITE ORDERED BY k DESC NULLS LAST"
    )
    meta = table_metadata(tbl)
    oid = int(meta["default-sort-order-id"])
    assert oid == 1
    assert meta["sort-orders"][-1]["fields"] == [
        {
            "transform": "identity",
            "source-id": 1,
            "direction": "desc",
            "null-order": "nulls-last",
        }
    ]
    # sorted write: 4 tasks over shuffled input -> per-file bounds
    # come out disjoint enough that a point filter prunes files
    df = (
        spark.range(4000)
        .select((F.xxhash64("id") % 1000).alias("k"))
        .repartition(4)
    )
    write_iceberg(spark, df, tbl, mode="append")
    files = iceberg_py.metadata_table(spark, tbl, "files").collect()
    assert all(f.sort_order_id == oid for f in files)
    # every file is internally sorted DESC on k
    import pyarrow.parquet as pq

    for f in files:
        ks = pq.read_table(f.file_path, columns=["k"]).column(
            "k"
        ).to_pylist()
        assert ks == sorted(ks, reverse=True)
    # unknown column refuses; same fields reuse the id; reset works
    with pytest.raises(UnsupportedOperationError, match="schema"):
        iceberg_py.set_iceberg_sort_order(tbl, ["nope"])
    iceberg_py.set_iceberg_sort_order(tbl, ["k DESC NULLS LAST"])
    assert int(table_metadata(tbl)["default-sort-order-id"]) == oid
    unity.sql("ALTER TABLE unity.default.so WRITE UNORDERED")
    assert int(table_metadata(tbl)["default-sort-order-id"]) == 0
    write_iceberg(
        spark,
        spark.range(5).select(F.col("id").alias("k")),
        tbl,
        mode="append",
    )
    latest = iceberg_py.metadata_table(spark, tbl, "files").collect()
    assert any(f.sort_order_id is None for f in latest)
