"""Row tracking (delta.enableRowTracking — the rowTracking +
domainMetadata writer features): every add action carries a
baseRowId range above the rowIdHighWaterMark (kept in the
delta.rowTracking metadata domain), fresh row id of row i =
baseRowId + i, and OPTIMIZE/PURGE rewrites preserve ids by
materializing them into the configured hidden columns. Beyond the
reference (delta-rs 0.18 has no row tracking).
"""

from __future__ import annotations

import json
import os

import pytest

from local_lakehouse_spark.exceptions import UnsupportedOperationError
from local_lakehouse_spark.sources.delta_py import (
    ROW_TRACKING_DOMAIN,
    DeltaLog,
    _row_id_watermark,
    compact,
    delete_where,
    purge,
    read_delta,
    read_delta_with_row_ids,
    set_properties,
    write_delta,
)


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


def _rt_table(spark, tbl, n=10):
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(n)], "id long, s string"
    ).coalesce(2)
    write_delta(spark, df, tbl)
    set_properties(tbl, {"delta.enableRowTracking": "true"})


def test_enable_backfills_and_declares_features(spark, tbl):
    _rt_table(spark, tbl)
    log = DeltaLog(tbl)
    snap = log.snapshot()
    wf = set(snap.protocol.get("writerFeatures") or [])
    assert {"rowTracking", "domainMetadata"} <= wf
    # every live add carries a baseRowId; ranges are disjoint
    bases = sorted(
        (a["baseRowId"], json.loads(a["stats"])["numRecords"])
        for a in snap.adds.values()
    )
    assert all(b >= 0 for b, _n in bases)
    for (b1, n1), (b2, _n2) in zip(bases, bases[1:]):
        assert b2 >= b1 + n1
    assert _row_id_watermark(snap) >= bases[-1][0] + bases[-1][1] - 1
    assert ROW_TRACKING_DOMAIN in snap.domains
    # materialized column names fixed at enable time
    conf = snap.configuration
    assert conf["delta.rowTracking.materializedRowIdColumnName"].startswith(
        "_row-id-col-"
    )


def test_fresh_row_ids_unique_and_append_disjoint(spark, tbl):
    _rt_table(spark, tbl, n=8)
    df0 = read_delta_with_row_ids(spark, tbl)
    ids0 = {r.id: r._row_id for r in df0.collect()}
    assert len(set(ids0.values())) == 8
    write_delta(
        spark,
        spark.createDataFrame([(100, "x"), (101, "y")], "id long, s string"),
        tbl,
        mode="append",
    )
    df1 = read_delta_with_row_ids(spark, tbl)
    rows = {r.id: (r._row_id, r._row_commit_version) for r in df1.collect()}
    assert len({v[0] for v in rows.values()}) == 10
    # pre-existing rows keep their ids
    for k, v in ids0.items():
        assert rows[k][0] == v
    # appended rows carry the append's commit version
    v_append = DeltaLog(tbl).versions()[-1]
    assert rows[100][1] == v_append and rows[101][1] == v_append


def test_dv_delete_keeps_survivor_ids(spark, tbl):
    _rt_table(spark, tbl, n=10)
    before = {r.id: r._row_id for r in read_delta_with_row_ids(spark, tbl).collect()}
    delete_where(spark, tbl, "id % 3 = 0")
    after = {r.id: r._row_id for r in read_delta_with_row_ids(spark, tbl).collect()}
    assert set(after) == {i for i in range(10) if i % 3 != 0}
    for k, v in after.items():
        assert before[k] == v


def test_optimize_materializes_stable_ids(spark, tbl):
    """Bin-packing moves rows between files: ids must survive via the
    materialized columns, across TWO successive compactions."""
    import pyarrow.parquet as pq

    _rt_table(spark, tbl, n=6)
    for i in (100, 101, 102):
        write_delta(
            spark,
            spark.createDataFrame([(i, "x")], "id long, s string").coalesce(1),
            tbl,
            mode="append",
        )
    before = {r.id: r._row_id for r in read_delta_with_row_ids(spark, tbl).collect()}
    metrics = compact(spark, tbl, target_file_bytes=1 << 20)
    assert metrics["numFilesRemoved"] >= 2
    snap = DeltaLog(tbl).snapshot()
    mat = snap.configuration["delta.rowTracking.materializedRowIdColumnName"]
    new_files = [
        rel
        for rel, a in snap.adds.items()
        if a.get("dataChange") is False
    ]
    assert new_files
    for rel in new_files:
        assert mat in pq.read_schema(os.path.join(tbl, rel)).names
    after = {r.id: r._row_id for r in read_delta_with_row_ids(spark, tbl).collect()}
    assert after == before
    # second round: materialized values must win over fresh derivation
    for i in (200, 201):
        write_delta(
            spark,
            spark.createDataFrame([(i, "y")], "id long, s string").coalesce(1),
            tbl,
            mode="append",
        )
    mid = {r.id: r._row_id for r in read_delta_with_row_ids(spark, tbl).collect()}
    compact(spark, tbl, target_file_bytes=1 << 20)
    final = {r.id: r._row_id for r in read_delta_with_row_ids(spark, tbl).collect()}
    assert final == mid


def test_purge_materializes_stable_ids(spark, tbl):
    _rt_table(spark, tbl, n=10)
    delete_where(spark, tbl, "id % 2 = 0")
    before = {r.id: r._row_id for r in read_delta_with_row_ids(spark, tbl).collect()}
    snap = purge(spark, tbl)
    assert not snap.dv_adds
    after = {r.id: r._row_id for r in read_delta_with_row_ids(spark, tbl).collect()}
    assert after == before and set(after) == {1, 3, 5, 7, 9}


def test_checkpoint_roundtrips_domain_and_base_row_ids(spark, tbl):
    _rt_table(spark, tbl, n=4)
    log = DeltaLog(tbl)
    v = log.versions()[-1]
    log.write_checkpoint(v)
    before = {r.id: r._row_id for r in read_delta_with_row_ids(spark, tbl).collect()}
    # delete the pre-checkpoint JSON commits: replay must come from
    # the checkpoint alone
    for old in range(v):
        p = os.path.join(tbl, "_delta_log", f"{old:020d}.json")
        if os.path.exists(p):
            os.unlink(p)
    snap = DeltaLog(tbl).snapshot()
    assert ROW_TRACKING_DOMAIN in snap.domains
    assert all(
        a.get("baseRowId") is not None for a in snap.adds.values()
    )
    after = {r.id: r._row_id for r in read_delta_with_row_ids(spark, tbl).collect()}
    assert after == before
    # appends after the checkpoint continue above the watermark
    write_delta(
        spark,
        spark.createDataFrame([(50, "z")], "id long, s string"),
        tbl,
        mode="append",
    )
    ids = [r._row_id for r in read_delta_with_row_ids(spark, tbl).collect()]
    assert len(set(ids)) == 5


def test_read_refuses_without_property(spark, tbl):
    write_delta(
        spark,
        spark.createDataFrame([(1, "a")], "id long, s string"),
        tbl,
    )
    with pytest.raises(UnsupportedOperationError, match="RowTracking"):
        read_delta_with_row_ids(spark, tbl)


def test_plain_reads_unaffected(spark, tbl):
    """Row tracking must stay invisible to normal reads — the
    materialized columns never leak into read_delta results."""
    _rt_table(spark, tbl, n=6)
    compact(spark, tbl, target_file_bytes=1 << 20)
    df = read_delta(spark, tbl)
    assert df.columns == ["id", "s"]
    assert df.count() == 6


def test_pydelta_sink_refuses_row_tracked_table(spark, tbl):
    """The registered pydelta writer commits raw adds — it cannot
    assign baseRowId ranges, so a row-tracked table refuses with a
    pointer at delta_py.write_delta."""
    from local_lakehouse_spark.sources.pydelta_source import register

    register(spark)
    _rt_table(spark, tbl, n=3)
    df = spark.createDataFrame([(9, "z")], "id long, s string")
    with pytest.raises(Exception, match="baseRowId|row-tracked"):
        df.write.format("pydelta").mode("append").save(tbl)
