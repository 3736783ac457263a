"""File-backed local metastore replacing the reference's UC REST server.

Parity: the CRUD surface and error semantics of
/root/reference/uchelper/uc_api_wrapper.py:59-590 (create/get/list/
update/delete for catalogs, schemas, tables; force-delete cascade;
overwrite-with-rollback; default merge columns property), minus the
HTTP hop — state lives in one JSON file written atomically.

Scale note: the metastore holds metadata only (names, schemas, paths).
Data never flows through it, so a single JSON file is fine even when
the tables it points at are 100 TB; swap for a DB-backed store if the
*number of tables* ever becomes large.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from datetime import datetime, timezone
from typing import Optional
from uuid import uuid4

from .exceptions import AlreadyExistsError, DoesNotExistError
from .models import (
    DEFAULT_MERGE_COLUMNS_PROPERTY,
    Catalog,
    FileType,
    Schema,
    Table,
)


def _now() -> datetime:
    return datetime.now(timezone.utc)


class Metastore:
    """Three-level namespace store: catalog → schema → table."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._lock = threading.RLock()
        if not os.path.exists(path):
            self._dump({"catalogs": {}, "schemas": {}, "tables": {}})

    # -- persistence --------------------------------------------------------

    def _load(self) -> dict:
        with open(self.path) as f:
            return json.load(f)

    def _dump(self, state: dict) -> None:
        d = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f, indent=1, default=str)
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    # -- catalogs -----------------------------------------------------------
    # Parity: uc_api_wrapper.py:77-198

    def health_check(self) -> bool:
        """Parity: uc_api_wrapper.py:59-74 (server ping → file readable)."""
        try:
            self._load()
            return True
        except Exception:
            return False

    def create_catalog(self, catalog: Catalog) -> Catalog:
        with self._lock:
            state = self._load()
            if catalog.name in state["catalogs"]:
                raise AlreadyExistsError(f"Catalog {catalog.name} already exists")
            cat = catalog.model_copy(
                update={"created_at": _now(), "id": str(uuid4())}
            )
            state["catalogs"][cat.name] = json.loads(cat.model_dump_json())
            self._dump(state)
            return cat

    def get_catalog(self, name: str) -> Catalog:
        state = self._load()
        if name not in state["catalogs"]:
            raise DoesNotExistError(f"Catalog {name} does not exist")
        return Catalog.model_validate(state["catalogs"][name])

    def list_catalogs(self) -> list[Catalog]:
        state = self._load()
        return [Catalog.model_validate(c) for c in state["catalogs"].values()]

    def update_catalog(self, name: str, new: Catalog) -> Catalog:
        """Rename/comment/properties; parity uc_api_wrapper.py:174-198."""
        with self._lock:
            state = self._load()
            if name not in state["catalogs"]:
                raise DoesNotExistError(f"Catalog {name} does not exist")
            if new.name != name and new.name in state["catalogs"]:
                raise AlreadyExistsError(f"Catalog {new.name} already exists")
            old = Catalog.model_validate(state["catalogs"][name])
            updated = old.model_copy(
                update={
                    "name": new.name,
                    "comment": new.comment,
                    "properties": new.properties,
                    "updated_at": _now(),
                }
            )
            del state["catalogs"][name]
            state["catalogs"][updated.name] = json.loads(updated.model_dump_json())
            if new.name != name:
                self._rename_catalog_refs(state, name, new.name)
            self._dump(state)
            return updated

    def _rename_catalog_refs(self, state: dict, old: str, new: str) -> None:
        for key in list(state["schemas"]):
            s = state["schemas"][key]
            if s["catalog_name"] == old:
                s["catalog_name"] = new
                s["full_name"] = f"{new}.{s['name']}"
                del state["schemas"][key]
                state["schemas"][f"{new}.{s['name']}"] = s
        for key in list(state["tables"]):
            t = state["tables"][key]
            if t["catalog_name"] == old:
                t["catalog_name"] = new
                del state["tables"][key]
                state["tables"][f"{new}.{t['schema_name']}.{t['name']}"] = t

    def delete_catalog(self, name: str, force: bool = False) -> bool:
        """Refuses non-empty unless force; parity uc_api_wrapper.py:102-130."""
        with self._lock:
            state = self._load()
            if name not in state["catalogs"]:
                raise DoesNotExistError(f"Catalog {name} does not exist")
            schemas = [
                s for s in state["schemas"].values() if s["catalog_name"] == name
            ]
            if schemas and not force:
                return False
            for s in schemas:
                self._delete_schema_in_state(state, name, s["name"])
            del state["catalogs"][name]
            self._dump(state)
            return True

    # -- schemas ------------------------------------------------------------
    # Parity: uc_api_wrapper.py:201-335

    def create_schema(self, schema: Schema) -> Schema:
        with self._lock:
            state = self._load()
            if schema.catalog_name not in state["catalogs"]:
                raise DoesNotExistError(
                    f"Catalog {schema.catalog_name} does not exist"
                )
            key = f"{schema.catalog_name}.{schema.name}"
            if key in state["schemas"]:
                raise AlreadyExistsError(f"Schema {key} already exists")
            sch = schema.model_copy(
                update={
                    "created_at": _now(),
                    "schema_id": str(uuid4()),
                    "full_name": key,
                }
            )
            state["schemas"][key] = json.loads(sch.model_dump_json())
            self._dump(state)
            return sch

    def get_schema(self, catalog: str, schema: str) -> Schema:
        state = self._load()
        key = f"{catalog}.{schema}"
        if key not in state["schemas"]:
            raise DoesNotExistError(f"Schema {key} does not exist")
        return Schema.model_validate(state["schemas"][key])

    def list_schemas(self, catalog: str) -> list[Schema]:
        state = self._load()
        if catalog not in state["catalogs"]:
            raise DoesNotExistError(f"Catalog {catalog} does not exist")
        return [
            Schema.model_validate(s)
            for s in state["schemas"].values()
            if s["catalog_name"] == catalog
        ]

    def update_schema(self, catalog: str, schema_name: str, new: Schema) -> Schema:
        with self._lock:
            state = self._load()
            key = f"{catalog}.{schema_name}"
            if key not in state["schemas"]:
                raise DoesNotExistError(f"Schema {key} does not exist")
            new_key = f"{catalog}.{new.name}"
            if new_key != key and new_key in state["schemas"]:
                raise AlreadyExistsError(f"Schema {new_key} already exists")
            old = Schema.model_validate(state["schemas"][key])
            updated = old.model_copy(
                update={
                    "name": new.name,
                    "comment": new.comment,
                    "properties": new.properties,
                    "updated_at": _now(),
                    "full_name": new_key,
                }
            )
            del state["schemas"][key]
            state["schemas"][new_key] = json.loads(updated.model_dump_json())
            if new_key != key:
                for tkey in list(state["tables"]):
                    t = state["tables"][tkey]
                    if t["catalog_name"] == catalog and t["schema_name"] == schema_name:
                        t["schema_name"] = new.name
                        del state["tables"][tkey]
                        state["tables"][f"{catalog}.{new.name}.{t['name']}"] = t
            self._dump(state)
            return updated

    def _delete_schema_in_state(self, state: dict, catalog: str, schema: str) -> None:
        for tkey in list(state["tables"]):
            t = state["tables"][tkey]
            if t["catalog_name"] == catalog and t["schema_name"] == schema:
                del state["tables"][tkey]
        state["schemas"].pop(f"{catalog}.{schema}", None)

    def delete_schema(self, catalog: str, schema: str, force: bool = False) -> bool:
        """Refuses non-empty unless force; parity uc_api_wrapper.py:226-254."""
        with self._lock:
            state = self._load()
            key = f"{catalog}.{schema}"
            if key not in state["schemas"]:
                raise DoesNotExistError(f"Schema {key} does not exist")
            tables = [
                t
                for t in state["tables"].values()
                if t["catalog_name"] == catalog and t["schema_name"] == schema
            ]
            if tables and not force:
                return False
            self._delete_schema_in_state(state, catalog, schema)
            self._dump(state)
            return True

    # -- tables -------------------------------------------------------------
    # Parity: uc_api_wrapper.py:338-550

    def create_table(self, table: Table) -> Table:
        with self._lock:
            state = self._load()
            skey = f"{table.catalog_name}.{table.schema_name}"
            if skey not in state["schemas"]:
                raise DoesNotExistError(f"Schema {skey} does not exist")
            key = table.full_name
            if key in state["tables"]:
                raise AlreadyExistsError(f"Table {key} already exists")
            tbl = table.model_copy(
                update={"created_at": _now(), "table_id": str(uuid4())}
            )
            state["tables"][key] = json.loads(tbl.model_dump_json())
            self._dump(state)
            return tbl

    def get_table(self, catalog: str, schema: str, table: str) -> Table:
        state = self._load()
        key = f"{catalog}.{schema}.{table}"
        if key not in state["tables"]:
            raise DoesNotExistError(f"Table {key} does not exist")
        return Table.model_validate(state["tables"][key])

    def list_tables(self, catalog: str, schema: str) -> list[Table]:
        state = self._load()
        skey = f"{catalog}.{schema}"
        if skey not in state["schemas"]:
            raise DoesNotExistError(f"Schema {skey} does not exist")
        return [
            Table.model_validate(t)
            for t in state["tables"].values()
            if t["catalog_name"] == catalog and t["schema_name"] == schema
        ]

    def update_table(self, table: Table) -> Table:
        """Comment/properties update (read-modify-write).

        Parity: uc_api_wrapper.py:445-467.
        """
        with self._lock:
            state = self._load()
            key = table.full_name
            if key not in state["tables"]:
                raise DoesNotExistError(f"Table {key} does not exist")
            old = Table.model_validate(state["tables"][key])
            # Reference semantics (uc_api_wrapper.update_table): a None
            # incoming field leaves the stored value unchanged rather
            # than clearing it — a drop-in caller passing comment=None
            # must not wipe an existing comment.
            patch: dict[str, object] = {"updated_at": _now()}
            if table.comment is not None:
                patch["comment"] = table.comment
            if table.properties is not None:
                patch["properties"] = table.properties
            updated = old.model_copy(update=patch)
            state["tables"][key] = json.loads(updated.model_dump_json())
            self._dump(state)
            return updated

    def set_table_file_type(
        self, catalog: str, schema: str, table: str, file_type: "FileType"
    ) -> Table:
        """Flip a table's storage format in place (CONVERT TO DELTA
        path — beyond the reference; UC's update endpoint only covers
        comment/properties, uc_api_wrapper.py:445-467)."""
        with self._lock:
            state = self._load()
            key = f"{catalog}.{schema}.{table}"
            if key not in state["tables"]:
                raise DoesNotExistError(f"Table {key} does not exist")
            old = Table.model_validate(state["tables"][key])
            updated = old.model_copy(
                update={"file_type": file_type, "updated_at": _now()}
            )
            state["tables"][key] = json.loads(updated.model_dump_json())
            self._dump(state)
            return updated

    def delete_table(self, catalog: str, schema: str, table: str) -> None:
        """Unregister only; files untouched (external tables).

        Parity: uc_api_wrapper.py:373-386.
        """
        with self._lock:
            state = self._load()
            key = f"{catalog}.{schema}.{table}"
            if key not in state["tables"]:
                raise DoesNotExistError(f"Table {key} does not exist")
            del state["tables"][key]
            self._dump(state)

    def overwrite_table(self, table: Table) -> Table:
        """Full metadata replace incl. columns: delete + recreate with
        rollback on failure. Parity: uc_api_wrapper.py:470-515.
        """
        with self._lock:
            old = self.get_table(table.catalog_name, table.schema_name, table.name)
            self.delete_table(table.catalog_name, table.schema_name, table.name)
            try:
                return self.create_table(table)
            except Exception:
                self.create_table(old)
                raise

    def set_table_default_merge_columns(
        self, catalog: str, schema: str, table: str, merge_columns: list[str]
    ) -> Table:
        """Validates cols exist then writes the property.

        Parity: uc_api_wrapper.py:518-550.
        """
        with self._lock:
            tbl = self.get_table(catalog, schema, table)
            col_names = {c.name for c in tbl.columns}
            for c in merge_columns:
                if c not in col_names:
                    raise DoesNotExistError(
                        f"Column {c} does not exist in table {tbl.full_name}"
                    )
            if tbl.properties is None:
                tbl.properties = {}
            tbl.properties[DEFAULT_MERGE_COLUMNS_PROPERTY] = ";".join(merge_columns)
            return self.update_table(tbl)
