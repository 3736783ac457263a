"""Catalog/schema/table CRUD state-machine tests.

Modeled on /root/reference/tests/test_api_wrapper.py:20-452 (create/
get/list/update/delete + AlreadyExists/DoesNotExist error paths,
force-delete semantics, default merge columns)."""

import pytest

from local_lakehouse_spark import (
    AlreadyExistsError,
    Catalog,
    Column,
    DataType,
    DoesNotExistError,
    FileType,
    Schema,
    Table,
    TableType,
)
from local_lakehouse_spark.metastore import Metastore


@pytest.fixture()
def store(tmp_path):
    return Metastore(str(tmp_path / "ms.json"))


def _table(name="t", cat="c1", sch="s1", loc="/tmp/x"):
    return Table(
        name=name,
        catalog_name=cat,
        schema_name=sch,
        table_type=TableType.EXTERNAL,
        file_type=FileType.PARQUET,
        columns=[
            Column(name="id", data_type=DataType.LONG, position=0),
            Column(name="v", data_type=DataType.STRING, position=1),
        ],
        storage_location=f"file://{loc}",
    )


def test_health_check(store):
    assert store.health_check()


def test_catalog_crud(store):
    cat = store.create_catalog(Catalog(name="c1", comment="hi"))
    assert cat.id is not None and cat.created_at is not None
    with pytest.raises(AlreadyExistsError):
        store.create_catalog(Catalog(name="c1"))
    got = store.get_catalog("c1")
    assert got.comment == "hi"
    with pytest.raises(DoesNotExistError):
        store.get_catalog("nope")
    store.create_catalog(Catalog(name="c2"))
    assert {c.name for c in store.list_catalogs()} == {"c1", "c2"}
    updated = store.update_catalog("c1", Catalog(name="c1renamed", comment="new"))
    assert updated.comment == "new" and updated.updated_at is not None
    assert {c.name for c in store.list_catalogs()} == {"c1renamed", "c2"}
    with pytest.raises(DoesNotExistError):
        store.update_catalog("c1", Catalog(name="x"))


def test_catalog_force_delete(store):
    store.create_catalog(Catalog(name="c1"))
    store.create_schema(Schema(name="s1", catalog_name="c1"))
    # refuses non-empty unless force (uc_api_wrapper.py:106-126 parity)
    assert store.delete_catalog("c1", force=False) is False
    assert store.delete_catalog("c1", force=True) is True
    with pytest.raises(DoesNotExistError):
        store.get_catalog("c1")
    with pytest.raises(DoesNotExistError):
        store.get_schema("c1", "s1")


def test_schema_crud(store):
    with pytest.raises(DoesNotExistError):
        store.create_schema(Schema(name="s1", catalog_name="nope"))
    store.create_catalog(Catalog(name="c1"))
    sch = store.create_schema(Schema(name="s1", catalog_name="c1"))
    assert sch.full_name == "c1.s1"
    with pytest.raises(AlreadyExistsError):
        store.create_schema(Schema(name="s1", catalog_name="c1"))
    assert [s.name for s in store.list_schemas("c1")] == ["s1"]
    store.update_schema("c1", "s1", Schema(name="s2", catalog_name="c1"))
    assert [s.name for s in store.list_schemas("c1")] == ["s2"]
    assert store.delete_schema("c1", "s2") is True


def test_schema_force_delete(store):
    store.create_catalog(Catalog(name="c1"))
    store.create_schema(Schema(name="s1", catalog_name="c1"))
    store.create_table(_table())
    assert store.delete_schema("c1", "s1", force=False) is False
    assert store.delete_schema("c1", "s1", force=True) is True
    with pytest.raises(DoesNotExistError):
        store.get_table("c1", "s1", "t")


def test_table_crud(store):
    store.create_catalog(Catalog(name="c1"))
    store.create_schema(Schema(name="s1", catalog_name="c1"))
    t = store.create_table(_table())
    assert t.table_id is not None
    with pytest.raises(AlreadyExistsError):
        store.create_table(_table())
    got = store.get_table("c1", "s1", "t")
    assert [c.name for c in got.columns] == ["id", "v"]
    assert [x.name for x in store.list_tables("c1", "s1")] == ["t"]
    got.comment = "hello"
    updated = store.update_table(got)
    assert updated.comment == "hello"
    store.delete_table("c1", "s1", "t")
    with pytest.raises(DoesNotExistError):
        store.get_table("c1", "s1", "t")


def test_overwrite_table(store):
    store.create_catalog(Catalog(name="c1"))
    store.create_schema(Schema(name="s1", catalog_name="c1"))
    store.create_table(_table())
    with pytest.raises(DoesNotExistError):
        store.overwrite_table(_table(name="absent"))
    t2 = _table()
    t2.columns.append(Column(name="extra", data_type=DataType.STRING, position=2))
    out = store.overwrite_table(t2)
    assert len(out.columns) == 3
    assert len(store.get_table("c1", "s1", "t").columns) == 3


def test_default_merge_columns(store):
    store.create_catalog(Catalog(name="c1"))
    store.create_schema(Schema(name="s1", catalog_name="c1"))
    store.create_table(_table())
    with pytest.raises(DoesNotExistError):
        store.set_table_default_merge_columns("c1", "s1", "t", ["nope"])
    out = store.set_table_default_merge_columns("c1", "s1", "t", ["id", "v"])
    assert out.default_merge_columns() == ["id", "v"]


def test_catalog_rename_cascades(store):
    store.create_catalog(Catalog(name="c1"))
    store.create_schema(Schema(name="s1", catalog_name="c1"))
    store.create_table(_table())
    store.update_catalog("c1", Catalog(name="cx"))
    assert store.get_schema("cx", "s1").catalog_name == "cx"
    assert store.get_table("cx", "s1", "t").catalog_name == "cx"


def test_validate_table_expectations(unity, spark, tmp_path):
    """validate_table: one-pass expectations report; NULL predicate
    results count as failures."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "id long, v double"
    )
    unity.create_as_table(
        df, "unity", "default", "vt", location=f"file://{tmp_path}/vt"
    )
    out = {
        r.expectation: (r.n_pass, r.n_fail)
        for r in unity.validate_table(
            "unity", "default", "vt",
            {"v_positive": "v > 0", "id_known": "id IS NOT NULL"},
        ).collect()
    }
    assert out["v_positive"] == (1, 2)  # -5 fails, NULL fails
    assert out["id_known"] == (3, 0)


def test_update_table_reference_positional_form(client):
    """Signature parity with the reference's update_table(catalog,
    schema, table) (reference client.py:271-286): the first two args
    name the update TARGET; `table` carries the new comment and
    properties. The native 1-arg form keeps working, and mixing the
    forms raises."""
    client.create_catalog(Catalog(name="c1"))
    client.create_schema(Schema(name="s1", catalog_name="c1"))
    client.create_table(_table())

    # reference form — Table carries stale catalog/schema on purpose
    carrier = _table(cat="ignored", sch="ignored")
    carrier.comment = "via-positional"
    updated = client.update_table("c1", "s1", carrier)
    assert updated.comment == "via-positional"
    assert (updated.catalog_name, updated.schema_name) == ("c1", "s1")

    # native form still works
    got = client.get_table("c1", "s1", "t")
    got.comment = "via-table"
    assert client.update_table(got).comment == "via-table"

    with pytest.raises(TypeError):
        client.update_table(got, "s1")
    with pytest.raises(TypeError):
        client.update_table("c1", "s1")
