"""``spark.read.format("pyiceberg")`` — the pure-Python Iceberg
reader (sources/iceberg_py.py) surfaced as a REGISTERED Spark data
source via the Python Data Source API, completing the format-string
story next to ``pydelta``/``pyavro``.

- one input partition PER DATA FILE (scan parallelism = live file
  count), Arrow RecordBatch transfer;
- columns bind per file by FOOTER FIELD ID with physical-name
  fallback — the same executor-side machinery as pydelta's id-mode
  reads (``_read_file_as_batches(field_ids=...)``);
- v2 POSITION deletes apply per file in the executor: each task
  reads the delete parquet(s), keeps the positions naming its data
  file, and drops those rows before the batches leave the reader;
- v2 EQUALITY deletes apply per file in the executor with the spec's
  sequence rule: a task loads only the delete files whose sequence is
  STRICTLY GREATER than its data file's, builds the key-tuple set
  (null-safe — None==None matches, the spec's rule), and filters its
  Arrow batches before they leave the reader;
- ``snapshotId`` / ``asOfTimestampMs`` options time-travel like
  ``read_iceberg``;
- STREAMING source (sequence-number offsets; append replay, or
  row-level ``changelog`` mode) and STREAMING SINK (exactly-once
  append snapshots via stream-app-id/stream-epoch-id summary
  markers — the pydelta txn sink's twin).

Scale: the per-task delete-file read is O(delete files) per data
file, and equality keysets sit in task memory. Fine for the modest
delete counts merge-on-read tables carry between compactions (CDC
key batches); a table with heavy deletes reads better through
``read_iceberg`` (one pooled delete scan + distributed anti-join).
"""

from __future__ import annotations

import os
import uuid
from typing import TYPE_CHECKING, Sequence

from typing import Iterable, List

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from ..exceptions import UnsupportedOperationError
from . import iceberg_py
from .pydelta_source import _read_file_as_batches

if TYPE_CHECKING:
    from pyspark.sql import SparkSession


def _required_path(options: dict) -> str:
    path = options.get("path")
    if not path:
        raise ValueError(
            "pyiceberg requires a path: .load('/table/dir')"
        )
    if path.startswith("file://"):
        path = path[len("file://"):]
    return path


def _part_strings(idpart: dict, name_of: dict) -> dict:
    """{field id: python value} -> {column name: string constant}
    for the shared batch reader's part_values cast path (None stays
    None = NULL partition)."""
    out = {}
    for fid, v in idpart.items():
        name = name_of.get(int(fid))
        if name is None:
            continue
        if v is None:
            out[name] = None
        elif isinstance(v, bool):
            out[name] = "true" if v else "false"
        else:
            out[name] = str(v)  # dates isoformat via str()
    return out


def _plain(schema: T.StructType) -> T.StructType:
    """The DataSource-facing logical schema: field names/types only
    (the field ids travel separately into the per-file binder)."""
    return T.StructType(
        [
            T.StructField(f.name, f.dataType, f.nullable)
            for f in schema.fields
        ]
    )


class _PyIcebergReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = _required_path(options)
        meta = iceberg_py.table_metadata(self._path)
        sid = options.get("snapshotid")
        ts = options.get("asoftimestampms")
        snap = iceberg_py._select_snapshot(
            meta,
            int(sid) if sid is not None else None,
            int(ts) if ts is not None else None,
            ref=options.get("ref") or options.get("branch"),
        )
        # time travel binds the snapshot's schema-id (read_iceberg
        # parity — no phantom post-evolution columns); a CURRENT
        # read binds the CURRENT schema (a metadata-only ADD COLUMN
        # shows up before any new snapshot exists)
        if sid is None and ts is None and not (
            options.get("ref") or options.get("branch")
        ):
            ice_schema = iceberg_py._current_schema(meta)
        else:
            ice_schema = iceberg_py._schema_for_snapshot(meta, snap)
        self._schema = iceberg_py.iceberg_schema_to_spark(ice_schema)
        if any(
            isinstance(f.dataType, T.VariantType)
            for f in self._schema.fields
        ):
            # Arrow has no variant representation this reader can
            # round-trip; the JVM scan handles variant natively
            raise UnsupportedOperationError(
                "pyiceberg: variant columns need the JVM scan path "
                "(read_iceberg / read_table)"
            )
        self._lineage = (
            str(options.get("rowlineage", "false")).lower() == "true"
        )
        # v3 initial-default: per-task fill for files whose footer
        # lacks the field (read_iceberg parity)
        self._defaults = {
            f["name"]: f["initial-default"]
            for f in ice_schema["fields"]
            if f.get("initial-default") is not None
        } or None
        if self._lineage:
            # v3 row lineage (read_iceberg(row_lineage=True) parity):
            # per-task _row_id = the file's inherited first_row_id +
            # position, stamped BEFORE delete masks so survivors
            # keep their ids
            if int(meta.get("format-version", 1)) < 3:
                raise UnsupportedOperationError(
                    "pyiceberg rowLineage needs a format-version 3 "
                    "table (v3's row-lineage feature)"
                )
            self._schema = T.StructType(
                list(self._schema.fields)
                + [
                    T.StructField("_row_id", T.LongType()),
                    T.StructField(
                        "_last_updated_sequence_number", T.LongType()
                    ),
                ]
            )
        self._fids = {
            f["name"]: int(f["id"]) for f in ice_schema["fields"]
        }
        data, pos, eq = iceberg_py._snapshot_files(
            meta, snap, self._path
        )
        # equality deletes: resolve each file's columns from its
        # equality_ids NOW (planning time — unknown/dropped ids must
        # refuse loudly, read_iceberg parity); application happens
        # per task with the sequence rule
        name_of = {int(f["id"]): f["name"] for f in ice_schema["fields"]}
        self._eq = []
        self._eqdrop: dict = {}  # dropped fid -> historical field
        for d in eq:
            ids = sorted(int(i) for i in (d.get("equality_ids") or []))
            if not ids:
                raise UnsupportedOperationError(
                    "pyiceberg: equality delete file without "
                    "equality_ids"
                )
            for i in ids:
                if i in name_of:
                    continue
                # dropped column still referenced by a live delete:
                # resolve against the schema HISTORY (read_iceberg
                # parity) — the per-task reader surfaces the value
                # under a sentinel name from files that store it
                hf = iceberg_py._historical_field(meta, i)
                if hf is None:
                    raise UnsupportedOperationError(
                        f"pyiceberg: equality delete references "
                        f"field id {i} not present in any schema "
                        "this metadata records"
                    )
                name_of[i] = f"__eqdrop_{i}"
                self._eqdrop[i] = hf
            part = d.get("partition")
            resolved = iceberg_py._resolve(d["file_path"], self._path)
            self._eq.append(
                {
                    "file": resolved,
                    "cols": [name_of[i] for i in ids],
                    # the delete file's PHYSICAL column names, bound
                    # by footer field id (renames after the delete
                    # was written must still apply — read_iceberg
                    # parity); metadata-sized driver probe, cached
                    "phys": list(
                        iceberg_py._eq_delete_physical_names(
                            resolved,
                            tuple(ids),
                            {i: name_of[i] for i in ids},
                        )
                    ),
                    "seq": int(d["_seq"]),
                    # partition scoping (spec): a scoped delete file
                    # applies only to data files of the SAME spec +
                    # partition record; empty record = global
                    "spec": int(d.get("_spec_id") or 0),
                    "part": dict(part)
                    if isinstance(part, dict) and part
                    else None,
                }
            )
        # dropped-id equality columns ride the per-task read under
        # sentinel names (footer-id bound; files without the column
        # NULL-fill) and are stripped before batches leave the task
        self._read_schema = self._schema
        if self._eqdrop:
            self._read_schema = T.StructType(
                list(self._schema.fields)
                + [
                    T.StructField(
                        f"__eqdrop_{fid}",
                        iceberg_py._iceberg_type(hf["type"]),
                        True,
                    )
                    for fid, hf in sorted(self._eqdrop.items())
                ]
            )
            self._fids = {
                **self._fids,
                **{
                    f"__eqdrop_{fid}": int(fid)
                    for fid in self._eqdrop
                },
            }
        self._schema_obj = ice_schema
        self._data = data
        # v3 deletion vectors: one (puffin path, offset, length)
        # triple per referenced data-file basename, loaded per task
        self._dv_by_ref = {}
        for d in pos:
            if str(d.get("file_format", "")).upper() != "PUFFIN":
                continue
            if (
                d.get("referenced_data_file") is None
                or d.get("content_offset") is None
                or d.get("content_size_in_bytes") is None
            ):
                raise UnsupportedOperationError(
                    "pyiceberg: v3 deletion-vector entry missing "
                    "referenced_data_file/content_offset/"
                    "content_size_in_bytes"
                )
            self._dv_by_ref[
                os.path.basename(
                    iceberg_py._resolve(
                        d["referenced_data_file"], self._path
                    )
                )
            ] = (
                iceberg_py._resolve(d["file_path"], self._path),
                int(d["content_offset"]),
                int(d["content_size_in_bytes"]),
            )
        self._deletes = [
            iceberg_py._resolve(d["file_path"], self._path)
            for d in pos
            if str(d.get("file_format", "")).upper() != "PUFFIN"
        ]
        if self._deletes or self._dv_by_ref:
            # delete positions match data files by BASENAME in the
            # per-task reader — colliding basenames (hive-layout
            # files migrated in) would apply one file's positions to
            # another; refuse loudly like read_iceberg
            basenames = [
                os.path.basename(
                    iceberg_py._resolve(d["file_path"], self._path)
                )
                for d in data
            ]
            if len(set(basenames)) != len(basenames):
                raise UnsupportedOperationError(
                    "pyiceberg: data files with colliding basenames "
                    "under position deletes — read with read_iceberg"
                )
        # Iceberg name mapping ({field id: [names]} -> logical-name
        # keys for the shared batch reader): binds files WITHOUT
        # footer field ids by their mapped footer names
        by_fid = iceberg_py.parse_name_mapping(meta) or {}
        self._name_map = {
            f["name"]: by_fid[int(f["id"])]
            for f in ice_schema["fields"]
            if int(f["id"]) in by_fid
        } or None

    _OPS = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        """Manifest-bounds scan planning: a file is dropped only when
        its column bounds PROVE no row matches; every filter is still
        re-applied row-level by Spark, so pruning is an optimization,
        never the correctness mechanism (pydelta's contract)."""
        conjuncts = [
            (f.attribute[0], self._OPS[type(f)], f.value)
            for f in filters
            if type(f) in self._OPS and len(f.attribute) == 1
        ]
        before = len(self._data)
        if conjuncts:
            self._data = iceberg_py.prune_data_files(
                self._data, self._schema_obj, conjuncts
            )
        self._files_pruned = before - len(self._data)
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        if not self._data:
            return [InputPartition({"file": None})]
        name_of = {v: k for k, v in self._fids.items()}
        return [
            InputPartition(
                {
                    "file": iceberg_py._resolve(
                        d["file_path"], self._path
                    ),
                    "deletes": self._deletes,
                    # equality deletes scoped AT PLANNING TIME by the
                    # spec's sequence rule (strictly greater only)
                    # AND partition (a scoped delete applies only to
                    # data files of its own spec + partition record)
                    "eq": [
                        e
                        for e in self._eq
                        if e["seq"] > int(d.get("_seq") or 0)
                        and (
                            e["part"] is None
                            or (
                                e["spec"]
                                == int(d.get("_spec_id") or 0)
                                and e["part"]
                                == (d.get("partition") or {})
                            )
                        )
                    ],
                    # identity-partition constants for columns the
                    # file (spec-legally) omits — string form, cast
                    # to the field type in the shared batch reader
                    "part": _part_strings(
                        d.get("_idpart") or {}, name_of
                    ),
                    "name_map": self._name_map,
                    # v3 DV blob coordinates for THIS data file (at
                    # most one, the v3 invariant)
                    "dv": self._dv_by_ref.get(
                        os.path.basename(
                            iceberg_py._resolve(
                                d["file_path"], self._path
                            )
                        )
                    ),
                    "lineage": (
                        (
                            d.get("_first_row_id"),
                            int(d.get("_seq") or 0),
                        )
                        if self._lineage
                        else None
                    ),
                    "defaults": self._defaults,
                }
            )
            for d in self._data
        ]

    def read(self, partition: InputPartition):
        abs_path = partition.value["file"]
        if abs_path is None:
            return
        deleted = None
        del_files = partition.value.get("deletes") or []
        if del_files:
            import numpy as np
            import pyarrow.parquet as pq

            base = os.path.basename(abs_path)
            hits = []
            for df in del_files:
                t = pq.read_table(df, columns=["file_path", "pos"])
                fp = t.column("file_path").to_pylist()
                pos = t.column("pos").to_pylist()
                hits.extend(
                    p
                    for f, p in zip(fp, pos)
                    if os.path.basename(f) == base
                )
            if hits:
                deleted = np.array(sorted(hits), dtype="int64")
        dv = partition.value.get("dv")
        if dv is not None:
            import numpy as np

            from . import iceberg_puffin

            idx = iceberg_puffin.read_dv_blob(*dv)
            deleted = (
                idx if deleted is None else np.union1d(deleted, idx)
            )
        batches = _read_file_as_batches(
            abs_path,
            getattr(self, "_read_schema", self._schema),
            partition.value.get("part") or {},
            deleted=deleted,
            field_ids=self._fids,
            name_map=partition.value.get("name_map"),
            lineage=partition.value.get("lineage"),
            defaults=partition.value.get("defaults"),
        )
        strip = bool(getattr(self, "_eqdrop", None))
        out_names = [f.name for f in self._schema.fields]
        eq = partition.value.get("eq") or []
        if not eq:
            if strip:
                for b in batches:
                    yield b.select(out_names)
            else:
                yield from batches
            return
        # equality deletes: key-tuple sets per distinct column list
        # (sequence scoping already done at planning). Python tuples
        # give exact null-safe equality (None == None matches) —
        # keysets are CDC-batch sized, task-memory resident.
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        groups: dict = {}
        for e in eq:
            cols = tuple(e["cols"])
            phys = list(e.get("phys") or cols)
            t = pq.read_table(e["file"], columns=phys)
            keys = (
                set(zip(*(t.column(pn).to_pylist() for pn in phys)))
                if t.num_rows
                else set()
            )
            groups.setdefault(cols, set()).update(keys)
        for b in batches:
            mask = np.ones(b.num_rows, dtype=bool)
            for cols, keyset in groups.items():
                if not keyset or not b.num_rows:
                    continue
                arrs = [
                    b.column(b.schema.get_field_index(c)).to_pylist()
                    for c in cols
                ]
                mask &= np.fromiter(
                    (t not in keyset for t in zip(*arrs)),
                    dtype=bool,
                    count=b.num_rows,
                )
            if strip:
                b = b.select(out_names)
            if mask.all():
                yield b
            elif mask.any():
                yield b.filter(pa.array(mask))


def _changelog_schema(table_schema: T.StructType) -> T.StructType:
    """Table columns + the change-metadata columns (the iceberg-spark
    changelog-view shape, with _commit_timestamp alongside for Delta
    CDF parity)."""
    return T.StructType(
        list(table_schema.fields)
        + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_commit_snapshot_id", T.LongType()),
            T.StructField("_commit_timestamp", T.TimestampType()),
        ]
    )


class _PyIcebergStreamReader(DataSourceStreamReader):
    """Iceberg as a STREAMING source (iceberg-spark's structured-
    streaming read, re-expressed): offsets are the table's SEQUENCE
    NUMBERS — durable in the metadata itself, so restarts resume
    exactly. Each microbatch replays the snapshots in
    ``(start, end]``: an APPEND snapshot contributes the data files
    its own manifests ADDED at that sequence (entry status=1,
    content=0 in manifests stamped with the snapshot's sequence —
    v2 inheritance covers entries with null sequence numbers); a
    snapshot that CHANGES existing data (position/equality delete
    files, or entries removed) fails the stream unless
    ``skipChangeCommits=true`` skips the whole snapshot — the same
    contract as the pydelta stream. Default start is the CURRENT
    sequence (only new commits replay); ``startingSnapshotId``
    replays from that snapshot inclusive."""

    def __init__(self, options: dict, schema: T.StructType):
        self._path = _required_path(options)
        self._skip_change = (
            str(options.get("skipchangecommits", "false")).lower()
            == "true"
        )
        self._changelog = (
            str(options.get("changelog", "false")).lower() == "true"
        )
        meta = iceberg_py.table_metadata(self._path)
        fmt = int(meta.get("format-version", 1))
        if fmt not in (2, 3):
            raise UnsupportedOperationError(
                "pyiceberg streaming offsets are the table's "
                f"sequence numbers; format-version {fmt} tables have "
                "none — read them in batch"
            )
        ice_schema = iceberg_py._current_schema(meta)
        self._schema = iceberg_py.iceberg_schema_to_spark(ice_schema)
        self._fids = {
            f["name"]: int(f["id"]) for f in ice_schema["fields"]
        }
        # changelog mode emits the table columns + the change-metadata
        # columns; all file binding still happens against the table
        # schema (the metadata columns materialize as partition-value
        # constants in the shared batch reader)
        self._out_schema = (
            _changelog_schema(self._schema)
            if self._changelog
            else self._schema
        )
        sid = options.get("startingsnapshotid")
        if sid is not None:
            snap = iceberg_py._select_snapshot(meta, int(sid))
            # inclusive: start just BELOW the snapshot's sequence
            self._initial = int(snap["sequence-number"]) - 1
        else:
            self._initial = int(meta.get("last-sequence-number", 0))

    def initialOffset(self) -> dict:
        return {"seq": self._initial}

    def latestOffset(self) -> dict:
        meta = iceberg_py.table_metadata(self._path)
        return {"seq": int(meta.get("last-sequence-number", 0))}

    def _snapshot_added(self, snap: dict, meta: dict) -> tuple:
        """Classify one snapshot's OWN manifest entries (manifest-list
        rows stamped with its sequence number; carried-forward
        manifests are older commits): ``(added_data [(entry, idpart)],
        added_position_delete_entries, added_equality_delete_entries,
        removed_any)``. Removed entries keep their ORIGINAL sequence
        numbers per the spec, so the status check is deliberately
        independent of the sequence filter that scopes added
        entries."""
        sseq = int(snap.get("sequence-number") or 0)
        added_data: list = []
        added_pos: list = []
        added_eq: list = []
        removed = False
        specs = iceberg_py._partition_specs(meta)
        fields_by_id = {
            f["id"]: f
            for f in iceberg_py._current_schema(meta)["fields"]
            if isinstance(f.get("type"), str)
        }
        mlist = iceberg_py._resolve(snap["manifest-list"], self._path)
        for mf in iceberg_py._read_avro_dicts(mlist):
            if int(mf.get("sequence_number") or 0) != sseq:
                continue  # carried-forward manifest: older commit
            spec_fields = specs.get(
                int(mf.get("partition_spec_id") or 0), []
            )
            mpath = iceberg_py._resolve(
                mf["manifest_path"], self._path
            )
            for entry in iceberg_py._read_avro_dicts(mpath):
                if entry.get("status") == 2:  # REMOVED existing data
                    # a retired deletion vector (replaced by this
                    # snapshot's new DV for the same file) is not
                    # removed DATA — the victim diff reconstructs
                    # the change exactly
                    if (
                        str(
                            entry["data_file"].get("file_format", "")
                        ).upper()
                        != "PUFFIN"
                    ):
                        removed = True
                    continue
                eseq = entry.get("sequence_number")
                if eseq is not None and int(eseq) != sseq:
                    continue
                if entry.get("status") == 1:  # ADDED
                    content = int(
                        entry["data_file"].get("content") or 0
                    )
                    if content == 0:
                        idp = iceberg_py._identity_values(
                            entry["data_file"].get("partition") or {},
                            spec_fields,
                            fields_by_id,
                        )
                        added_data.append((entry, idp))
                    elif content == 1:
                        added_pos.append(entry)
                    else:
                        # partition-scope matching needs the entry's
                        # spec (equality-delete victim planning)
                        entry = dict(entry)
                        entry["_spec_id"] = int(
                            mf.get("partition_spec_id") or 0
                        )
                        added_eq.append(entry)
        return added_data, added_pos, added_eq, removed

    def _new_entries(self, snap: dict, meta: dict) -> tuple:
        """``(added_data_entries, is_change)`` for the plain (replay)
        stream: ``is_change`` is true when the snapshot ADDED delete
        content, REMOVED entries (a REPLACE / compaction / overwrite
        rewrites existing rows into new files; replaying those files
        as inserts would duplicate the stream), or when its summary
        declares a non-append operation (catches foreign change
        snapshots even when their removed entries live in manifests
        this scan wouldn't read)."""
        op = (snap.get("summary") or {}).get("operation")
        added_data, added_pos, added_eq, removed = (
            self._snapshot_added(snap, meta)
        )
        changed = bool(
            (op is not None and op != "append")
            or added_pos
            or added_eq
            or removed
        )
        return added_data, changed

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        meta = iceberg_py.table_metadata(self._path)
        plan: list = []
        snaps = sorted(
            meta.get("snapshots") or [],
            key=lambda s: int(s.get("sequence-number") or 0),
        )
        name_of = {v: k for k, v in self._fids.items()}
        # after a rollback, snapshots off the current ancestor chain
        # are ABANDONED — replaying them would surface rows the table
        # no longer contains (None = legacy chain, keep seq window)
        ancestors = iceberg_py.current_ancestors(meta)
        for i, snap in enumerate(snaps):
            sseq = int(snap.get("sequence-number") or 0)
            if sseq <= start["seq"] or sseq > end["seq"]:
                continue
            if (
                ancestors is not None
                and int(snap["snapshot-id"]) not in ancestors
            ):
                continue
            if self._changelog:
                # victim rows live in the files visible before this
                # snapshot — its PARENT when recorded (after a
                # rollback the seq-predecessor can be an abandoned
                # branch, not the true prior state)
                parent = snap.get("parent-snapshot-id")
                if parent is not None:
                    prev = next(
                        (
                            s
                            for s in snaps
                            if int(s["snapshot-id"]) == int(parent)
                        ),
                        None,
                    )
                else:
                    prev = snaps[i - 1] if i > 0 else None
                plan.extend(
                    self._changelog_partitions(
                        snap, prev, meta, name_of,
                    )
                )
                continue
            new, changed = self._new_entries(snap, meta)
            if changed:
                if self._skip_change:
                    continue  # skip the WHOLE snapshot
                raise UnsupportedOperationError(
                    "Iceberg snapshot {0} (sequence {1}, operation "
                    "{2!r}) changes existing data (delete files, "
                    "removed/rewritten entries, or a non-append "
                    "operation); streaming cannot replay it — set "
                    "skipChangeCommits=true to skip such snapshots, "
                    "or read row-level changes with "
                    "option('changelog', 'true')".format(
                        snap["snapshot-id"],
                        sseq,
                        (snap.get("summary") or {}).get("operation"),
                    )
                )
            for e, idp in new:
                plan.append(
                    InputPartition(
                        {
                            "file": iceberg_py._resolve(
                                e["data_file"]["file_path"],
                                self._path,
                            ),
                            "part": _part_strings(idp, name_of),
                        }
                    )
                )
        if not plan:
            plan.append(InputPartition({"file": None}))
        return plan

    def _eq_descriptors(
        self, entries: list, name_of: dict, default_seq: int
    ) -> list:
        """Equality-delete manifest entries -> per-file descriptors
        (file, logical cols, footer-id-bound physical names,
        sequence, partition scope) for task-side keyset loading."""
        out = []
        for e in entries:
            d = e["data_file"] if "data_file" in e else e
            ids = sorted(
                int(i) for i in (d.get("equality_ids") or [])
            )
            if not ids:
                raise UnsupportedOperationError(
                    "pyiceberg changelog: equality delete file "
                    "without equality_ids"
                )
            unknown = [i for i in ids if i not in name_of]
            if unknown:
                raise UnsupportedOperationError(
                    "pyiceberg changelog: equality delete references"
                    f" dropped field ids {unknown}"
                )
            resolved = iceberg_py._resolve(
                d["file_path"], self._path
            )
            eseq = e.get("sequence_number")
            part = d.get("partition")
            out.append(
                {
                    "file": resolved,
                    "cols": [name_of[i] for i in ids],
                    "phys": list(
                        iceberg_py._eq_delete_physical_names(
                            resolved,
                            tuple(ids),
                            {i: name_of[i] for i in ids},
                        )
                    ),
                    "seq": (
                        int(eseq)
                        if eseq is not None
                        else int(default_seq)
                    ),
                    "spec": int(e.get("_spec_id") or 0),
                    "part": (
                        dict(part)
                        if isinstance(part, dict) and part
                        else None
                    ),
                }
            )
        return out

    def _changelog_partitions(
        self, snap: dict, prev: "dict | None", meta: dict, name_of: dict
    ) -> list:
        """Row-level CHANGE partitions for one snapshot (the
        iceberg-spark changelog scan, re-expressed): an append's added
        files emit as ``insert`` rows; a row-level DML snapshot
        (delete/update/merge/replaceWhere — position-delete files +
        optional new images, the in-repo writer's shape) emits the
        delete files' victim rows as ``delete`` (materialized per
        task from the PRIOR snapshot's files) plus its added files as
        ``insert``; a maintenance ``replace`` (compaction) emits
        NOTHING — no logical change. EQUALITY-DELETE snapshots (the
        Flink-CDC upsert shape) reconstruct their victims: one task
        per prior data file in a delete's sequence+partition scope
        reads the file, masks rows already dead at the prior snapshot
        (position/DV/earlier equality deletes), and emits the rows
        matching the NEW delete keysets as ``delete`` — an
        O(changed + matched data) plan. Full overwrites (status=2
        removals) still refuse unless skipChangeCommits skips the
        snapshot."""
        from datetime import datetime, timezone

        op = (snap.get("summary") or {}).get("operation")
        if op == "replace":
            return []
        added_data, added_pos, added_eq, removed = (
            self._snapshot_added(snap, meta)
        )
        if removed:
            if self._skip_change:
                return []
            raise UnsupportedOperationError(
                "Iceberg changelog: snapshot {0} (operation {1!r}) "
                "carries removed (rewritten) entries — victim rows "
                "are not reconstructible from its own manifests; set "
                "skipChangeCommits=true to skip it".format(
                    snap["snapshot-id"], op
                )
            )
        ts = datetime.fromtimestamp(
            int(snap["timestamp-ms"]) / 1000, tz=timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S.%f") + "Z"
        stamp = {
            "_commit_snapshot_id": str(snap["snapshot-id"]),
            "_commit_timestamp": ts,
        }
        plan: list = []
        # v3 deletion vectors split from parquet position deletes:
        # a DV's victims are its positions MINUS the file's PRIOR
        # DV's (DV writes commit the union, so the prior is a subset)
        dv_pos = [
            e
            for e in added_pos
            if str(
                e["data_file"].get("file_format", "")
            ).upper() == "PUFFIN"
        ]
        added_pos = [
            e
            for e in added_pos
            if str(
                e["data_file"].get("file_format", "")
            ).upper() != "PUFFIN"
        ]
        if added_pos or dv_pos or added_eq:
            # victim rows live in the files visible BEFORE this
            # snapshot; ship that (metadata-sized) basename map to
            # each delete-file task
            fmap: dict = {}
            prior_dv: dict = {}
            pdata: list = []
            ppos: list = []
            peq: list = []
            if prev is not None:
                pdata, ppos, peq = iceberg_py._snapshot_files(
                    meta, prev, self._path
                )
                for d in pdata:
                    ap = iceberg_py._resolve(
                        d["file_path"], self._path
                    )
                    base = os.path.basename(ap)
                    if base in fmap:
                        raise UnsupportedOperationError(
                            "pyiceberg changelog: colliding data-file"
                            " basenames — positions cannot be mapped"
                            " unambiguously"
                        )
                    fmap[base] = {
                        "file": ap,
                        "part": _part_strings(
                            d.get("_idpart") or {}, name_of
                        ),
                    }
                for d in ppos:
                    if (
                        str(d.get("file_format", "")).upper()
                        == "PUFFIN"
                    ):
                        prior_dv[
                            os.path.basename(
                                iceberg_py._resolve(
                                    d["referenced_data_file"],
                                    self._path,
                                )
                            )
                        ] = (
                            iceberg_py._resolve(
                                d["file_path"], self._path
                            ),
                            int(d["content_offset"]),
                            int(d["content_size_in_bytes"]),
                        )
            for e in added_pos:
                plan.append(
                    InputPartition(
                        {
                            "kind": "posdel",
                            "delete_file": iceberg_py._resolve(
                                e["data_file"]["file_path"],
                                self._path,
                            ),
                            "fmap": fmap,
                            "part": {
                                **stamp, "_change_type": "delete",
                            },
                        }
                    )
                )
            for e in dv_pos:
                d = e["data_file"]
                ref = os.path.basename(
                    iceberg_py._resolve(
                        d["referenced_data_file"], self._path
                    )
                )
                plan.append(
                    InputPartition(
                        {
                            "kind": "dvdel",
                            "dv": (
                                iceberg_py._resolve(
                                    d["file_path"], self._path
                                ),
                                int(d["content_offset"]),
                                int(d["content_size_in_bytes"]),
                            ),
                            "ref": ref,
                            "prior_dv": prior_dv.get(ref),
                            "fmap": fmap,
                            "part": {
                                **stamp, "_change_type": "delete",
                            },
                        }
                    )
                )
            if added_eq and pdata:
                sseq = int(snap.get("sequence-number") or 0)
                new_eq = self._eq_descriptors(
                    added_eq, name_of, default_seq=sseq
                )
                prior_eq = self._eq_descriptors(
                    [
                        {"data_file": d, "_spec_id": d.get("_spec_id"),
                         "sequence_number": d.get("_seq")}
                        for d in peq
                    ],
                    name_of,
                    default_seq=0,
                )
                pos_files = [
                    iceberg_py._resolve(d["file_path"], self._path)
                    for d in ppos
                    if str(d.get("file_format", "")).upper()
                    != "PUFFIN"
                ]

                def _scoped(descs, fseq, fspec, fpart):
                    return [
                        e
                        for e in descs
                        if e["seq"] > fseq
                        and (
                            e["part"] is None
                            or (
                                e["spec"] == fspec
                                and e["part"] == fpart
                            )
                        )
                    ]

                for f in pdata:
                    fseq = int(f.get("_seq") or 0)
                    fspec = int(f.get("_spec_id") or 0)
                    fpart = f.get("partition") or {}
                    applicable = _scoped(new_eq, fseq, fspec, fpart)
                    if not applicable:
                        continue
                    ap = iceberg_py._resolve(
                        f["file_path"], self._path
                    )
                    base = os.path.basename(ap)
                    plan.append(
                        InputPartition(
                            {
                                "kind": "eqvictims",
                                "file": ap,
                                "base": base,
                                "part_vals": _part_strings(
                                    f.get("_idpart") or {}, name_of
                                ),
                                "pos_files": pos_files,
                                "dv": prior_dv.get(base),
                                "prior_eq": _scoped(
                                    prior_eq, fseq, fspec, fpart
                                ),
                                "new_eq": applicable,
                                "part": {
                                    **stamp,
                                    "_change_type": "delete",
                                },
                            }
                        )
                    )
        for e, idp in added_data:
            plan.append(
                InputPartition(
                    {
                        "file": iceberg_py._resolve(
                            e["data_file"]["file_path"], self._path
                        ),
                        "part": {
                            **_part_strings(idp, name_of),
                            **stamp,
                            "_change_type": "insert",
                        },
                    }
                )
            )
        return plan

    def read(self, partition: InputPartition):
        v = partition.value
        if v.get("kind") == "eqvictims":
            import numpy as np
            import pyarrow as pa
            import pyarrow.parquet as pq

            # prior positional death: position-delete files naming
            # this file + its prior deletion vector
            deleted = None
            hits = []
            for dfp in v.get("pos_files") or []:
                t = pq.read_table(dfp, columns=["file_path", "pos"])
                hits.extend(
                    p
                    for f_, p in zip(
                        t.column("file_path").to_pylist(),
                        t.column("pos").to_pylist(),
                    )
                    if os.path.basename(f_) == v["base"]
                )
            if hits:
                deleted = np.array(sorted(hits), dtype="int64")
            if v.get("dv") is not None:
                from . import iceberg_puffin

                idx = iceberg_puffin.read_dv_blob(*v["dv"])
                deleted = (
                    idx
                    if deleted is None
                    else np.union1d(deleted, idx)
                )

            def _load_groups(descs):
                groups: dict = {}
                for e in descs:
                    cols = tuple(e["cols"])
                    phys = list(e.get("phys") or cols)
                    t = pq.read_table(e["file"], columns=phys)
                    keys = (
                        set(
                            zip(
                                *(
                                    t.column(pn).to_pylist()
                                    for pn in phys
                                )
                            )
                        )
                        if t.num_rows
                        else set()
                    )
                    groups.setdefault(cols, set()).update(keys)
                return groups

            prior_g = _load_groups(v.get("prior_eq") or [])
            new_g = _load_groups(v.get("new_eq") or [])
            batches = _read_file_as_batches(
                v["file"],
                self._out_schema,
                {**(v.get("part_vals") or {}), **v["part"]},
                deleted=deleted,
                field_ids=self._fids,
            )
            for b in batches:
                if not b.num_rows:
                    continue
                keep = np.zeros(b.num_rows, dtype=bool)
                for cols, ks in new_g.items():
                    if not ks:
                        continue
                    arrs = [
                        b.column(
                            b.schema.get_field_index(c)
                        ).to_pylist()
                        for c in cols
                    ]
                    keep |= np.fromiter(
                        (t_ in ks for t_ in zip(*arrs)),
                        dtype=bool,
                        count=b.num_rows,
                    )
                for cols, ks in prior_g.items():
                    if not ks or not keep.any():
                        continue
                    arrs = [
                        b.column(
                            b.schema.get_field_index(c)
                        ).to_pylist()
                        for c in cols
                    ]
                    keep &= np.fromiter(
                        (t_ not in ks for t_ in zip(*arrs)),
                        dtype=bool,
                        count=b.num_rows,
                    )
                if keep.all():
                    yield b
                elif keep.any():
                    yield b.filter(pa.array(keep))
            return
        if v.get("kind") == "dvdel":
            import numpy as np

            from . import iceberg_puffin

            victims = iceberg_puffin.read_dv_blob(*v["dv"])
            if v.get("prior_dv") is not None:
                victims = np.setdiff1d(
                    victims,
                    iceberg_puffin.read_dv_blob(*v["prior_dv"]),
                )
            if not len(victims):
                return
            info = v["fmap"].get(v["ref"])
            if info is None:
                raise UnsupportedOperationError(
                    "pyiceberg changelog: deletion vector references"
                    f" unknown data file {v['ref']!r}"
                )
            yield from _read_file_as_batches(
                info["file"],
                self._out_schema,
                {**(info["part"] or {}), **v["part"]},
                field_ids=self._fids,
                keep_only=[int(x) for x in victims],
            )
            return
        if v.get("kind") == "posdel":
            import pyarrow.parquet as pq

            t = pq.read_table(
                v["delete_file"], columns=["file_path", "pos"]
            )
            by: dict = {}
            for f, p in zip(
                t.column("file_path").to_pylist(),
                t.column("pos").to_pylist(),
            ):
                by.setdefault(os.path.basename(f), []).append(p)
            for base, poss in sorted(by.items()):
                info = v["fmap"].get(base)
                if info is None:
                    raise UnsupportedOperationError(
                        f"pyiceberg changelog: delete file references"
                        f" unknown data file {base!r}"
                    )
                yield from _read_file_as_batches(
                    info["file"],
                    self._out_schema,
                    {**(info["part"] or {}), **v["part"]},
                    field_ids=self._fids,
                    keep_only=sorted(poss),
                )
            return
        abs_path = v["file"]
        if abs_path is None:
            return
        yield from _read_file_as_batches(
            abs_path,
            self._out_schema,
            v.get("part") or {},
            field_ids=self._fids,
        )

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the Iceberg metadata itself

    def stop(self) -> None:
        pass


class _PyIcebergChangelogBatchReader(DataSourceReader):
    """BATCH changelog (iceberg-spark's ``create_changelog_view``
    shape): one DataFrame of row-level insert/delete changes between
    two snapshots — ``startSnapshotId`` EXCLUSIVE (default: table
    start) and ``endSnapshotId`` inclusive (default: current). The
    planning and per-task materialization are exactly the streaming
    changelog's (one partition per added data file / delete file;
    victim rows read at their deleted positions), so batch and stream
    agree row-for-row over the same range."""

    def __init__(self, options: dict):
        opts = dict(options)
        opts["changelog"] = "true"
        self._sr = _PyIcebergStreamReader(opts, None)
        meta = iceberg_py.table_metadata(self._sr._path)
        snaps = sorted(
            meta.get("snapshots") or [],
            key=lambda s: int(s.get("sequence-number") or 0),
        )
        seq_of = {
            int(s["snapshot-id"]): int(s.get("sequence-number") or 0)
            for s in snaps
        }

        def _seq(key, default):
            sid = options.get(key)
            if sid is None:
                return default
            if int(sid) not in seq_of:
                raise UnsupportedOperationError(
                    f"pyiceberg changelog: {key} {sid} is not a "
                    "snapshot of this table"
                )
            return seq_of[int(sid)]

        self._start = _seq("startsnapshotid", 0)
        self._end = _seq(
            "endsnapshotid",
            int(meta.get("last-sequence-number", 0)),
        )

    def partitions(self) -> Sequence[InputPartition]:
        return self._sr.partitions(
            {"seq": self._start}, {"seq": self._end}
        )

    def read(self, partition: InputPartition):
        yield from self._sr.read(partition)


class _IceFileCommit(WriterCommitMessage):
    def __init__(self, rel: str):
        self.rel = rel


class _PyIcebergStreamWriter(DataSourceStreamArrowWriter):
    """Streaming SINK: every microbatch commits one Iceberg APPEND
    snapshot whose summary carries ``stream-app-id`` / ``stream-
    epoch-id`` — the exactly-once markers (iceberg-spark's streaming
    sink records the same shape). On restart, a replayed microbatch
    whose batchId is ≤ the app's last committed epoch is SKIPPED and
    its freshly written part files deleted — idempotent exactly-once
    appends on an at-least-once engine (the pydelta sink's txn-action
    twin). ``.option("txnAppId", ...)`` scopes idempotency per query.

    Executors write field-id-stamped parquet straight into ``data/``
    (footer ids = the table's Iceberg field ids, so batch readers
    bind them like any other data file); the driver turns the
    committed files into ONE added-entries manifest with footer-
    derived column bounds. Unpartitioned v2 tables only (Spark's
    sink API hands the writer opaque Arrow batches — spec layout
    needs the DataFrame writer); a missing table is CREATED on the
    first commit from the sink schema. Single-writer metadata commit
    (the module's filesystem-catalog contract)."""

    def __init__(self, options: dict, schema: T.StructType):
        self._path = _required_path(options)
        self._schema = schema
        self._app = options.get("txnappid", "pyiceberg-stream")
        for f in schema.fields:
            if isinstance(
                f.dataType, (T.StructType, T.ArrayType, T.MapType)
            ):
                raise UnsupportedOperationError(
                    "pyiceberg stream sink supports top-level "
                    f"primitive columns; {f.name!r} is nested"
                )
        if iceberg_py.is_iceberg_table(self._path):
            meta = iceberg_py.table_metadata(self._path)
            iceberg_py._require_v2(
                meta, "pyiceberg stream sink", allowed=(2, 3)
            )
            ice = iceberg_py._current_schema(meta)
            table_schema = iceberg_py.iceberg_schema_to_spark(ice)
            want = {
                f.name: f.dataType for f in table_schema.fields
            }
            have = {f.name: f.dataType for f in schema.fields}
            if set(have) != set(want):
                raise UnsupportedOperationError(
                    f"pyiceberg stream sink schema "
                    f"{sorted(have)} != table schema {sorted(want)}"
                )
            mismatched = [
                n for n, dt in have.items() if dt != want[n]
            ]
            if mismatched:
                raise UnsupportedOperationError(
                    "pyiceberg stream sink column types differ from "
                    f"the table schema: {sorted(mismatched)}"
                )
            spec = iceberg_py._partition_specs(meta).get(
                int(meta.get("default-spec-id", 0)), []
            )
            if spec:
                raise UnsupportedOperationError(
                    "pyiceberg stream sink supports unpartitioned "
                    "tables (the spec layout needs the DataFrame "
                    "writer: iceberg_py.write_iceberg)"
                )
            self._create_meta = None
            self._schema_obj = ice
        else:
            self._create_meta = iceberg_py._new_table_meta(
                schema, self._path
            )
            self._schema_obj = self._create_meta["schemas"][0]
        self._fids = {
            f["name"]: int(f["id"])
            for f in self._schema_obj["fields"]
        }

    # -- executors -----------------------------------------------------
    def write(self, iterator) -> _IceFileCommit:
        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = list(iterator)
        if not batches or sum(b.num_rows for b in batches) == 0:
            return _IceFileCommit("")
        t = pa.Table.from_batches(batches)
        # stamp footer field ids so every reader binds by id
        fields = [
            f.with_metadata(
                {b"PARQUET:field_id": str(self._fids[f.name]).encode()}
            )
            for f in t.schema
        ]
        t = t.cast(pa.schema(fields))
        ddir = os.path.join(self._path, "data")
        os.makedirs(ddir, exist_ok=True)
        rel = f"stream-{uuid.uuid4().hex}.parquet"
        pq.write_table(
            t, os.path.join(ddir, rel), compression="snappy"
        )
        return _IceFileCommit(rel)

    # -- driver ----------------------------------------------------------
    def _last_epoch(self, meta: dict) -> int:
        """The app's committed high-water epoch. Authoritative source
        is the ``stream-epoch.<app>`` TABLE PROPERTY persisted at
        commit time — expire_snapshots can expire the snapshot whose
        summary carried the marker while newer non-stream commits
        survive, and a restarted query must still skip the replayed
        microbatch. Snapshot summaries are kept as a back-compat
        fallback for tables committed before the property existed."""
        last = -1
        prop = (meta.get("properties") or {}).get(
            f"stream-epoch.{self._app}"
        )
        if prop is not None:
            try:
                last = int(prop)
            except ValueError:
                pass
        for s in meta.get("snapshots") or []:
            smry = s.get("summary") or {}
            if smry.get("stream-app-id") == self._app:
                try:
                    last = max(last, int(smry["stream-epoch-id"]))
                except (KeyError, ValueError):
                    pass
        return last

    def _cleanup(self, rels) -> None:
        for rel in rels:
            try:
                os.unlink(os.path.join(self._path, "data", rel))
            except FileNotFoundError:
                pass

    def commit(self, messages, batchId: int) -> None:
        import pyarrow.parquet as pq

        rels = [
            m.rel for m in messages if m is not None and m.rel
        ]
        if iceberg_py.is_iceberg_table(self._path):
            meta = iceberg_py.table_metadata(self._path)
        else:
            meta = self._create_meta
        if batchId <= self._last_epoch(meta):
            # replayed microbatch after restart: already committed
            self._cleanup(rels)
            return
        entries = []
        for rel in rels:
            abs_p = os.path.join(self._path, "data", rel)
            lows, highs = iceberg_py._file_bounds(
                abs_p, self._schema_obj
            )
            entries.append(
                {
                    "file_path": abs_p,
                    "record_count": pq.read_metadata(abs_p).num_rows,
                    "file_size_in_bytes": os.path.getsize(abs_p),
                    "lower_bounds": lows,
                    "upper_bounds": highs,
                }
            )
        os.makedirs(
            iceberg_py._metadata_dir(self._path), exist_ok=True
        )
        prior = iceberg_py._prior_manifest_rows(meta, self._path)
        snap_id = iceberg_py._new_snapshot_id()
        seq = int(meta.get("last-sequence-number", 0)) + 1
        rows = list(prior)
        if entries:
            rows.append(
                iceberg_py._write_manifest(
                    self._path,
                    entries,
                    snap_id,
                    seq,
                    content=0,
                    spec_id=int(meta.get("default-spec-id", 0)),
                )["row"]
            )
        iceberg_py._commit_snapshot(
            self._path,
            meta,
            rows,
            "append",
            snap_id,
            extra_summary={
                "stream-app-id": self._app,
                "stream-epoch-id": int(batchId),
            },
            extra_properties={
                f"stream-epoch.{self._app}": int(batchId)
            },
        )

    def abort(self, messages, batchId: int) -> None:
        self._cleanup(
            m.rel for m in messages or [] if m is not None and m.rel
        )


class _PyIcebergMetadataReader(DataSourceReader):
    """``option("metadata", kind)``: iceberg's inspection tables
    (snapshots / history / refs / manifests / files / delete_files /
    partitions) through the DataSource — rows decoded driver-side
    from manifest metadata (metadata-sized, exactly what
    iceberg-spark's db.table.<kind> reads), served as one
    partition."""

    def __init__(self, options: dict):
        sid = options.get("snapshotid")
        _, self._rows = iceberg_py._metadata_rows(
            _required_path(options),
            str(options["metadata"]).lower(),
            int(sid) if sid is not None else None,
        )

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(0)]

    def read(self, partition):
        for r in self._rows:
            yield tuple(r)


class PyIcebergDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pyiceberg"

    def schema(self):
        md = self.options.get("metadata")
        if md is not None:
            sid = self.options.get("snapshotid")
            ddl, _ = iceberg_py._metadata_rows(
                _required_path(self.options),
                str(md).lower(),
                int(sid) if sid is not None else None,
            )
            return ddl
        meta = iceberg_py.table_metadata(
            _required_path(self.options)
        )
        sid = self.options.get("snapshotid")
        ts = self.options.get("asoftimestampms")
        ref = self.options.get("ref") or self.options.get("branch")
        if sid is not None or ts is not None or ref is not None:
            # the plan schema must match what the reader will bind:
            # time travel reads with the SNAPSHOT's schema-id
            snap = iceberg_py._select_snapshot(
                meta,
                int(sid) if sid is not None else None,
                int(ts) if ts is not None else None,
                ref=ref,
            )
            ice = iceberg_py._schema_for_snapshot(meta, snap)
        else:
            ice = iceberg_py._current_schema(meta)
        schema = _plain(iceberg_py.iceberg_schema_to_spark(ice))
        if str(self.options.get("changelog", "false")).lower() == "true":
            schema = _changelog_schema(schema)
        elif (
            str(self.options.get("rowlineage", "false")).lower()
            == "true"
        ):
            schema = T.StructType(
                list(schema.fields)
                + [
                    T.StructField("_row_id", T.LongType()),
                    T.StructField(
                        "_last_updated_sequence_number", T.LongType()
                    ),
                ]
            )
        return schema

    def reader(self, schema: T.StructType) -> DataSourceReader:
        if self.options.get("metadata") is not None:
            return _PyIcebergMetadataReader(self.options)
        if str(self.options.get("changelog", "false")).lower() == "true":
            return _PyIcebergChangelogBatchReader(self.options)
        return _PyIcebergReader(self.options)

    def streamReader(
        self, schema: T.StructType
    ) -> DataSourceStreamReader:
        return _PyIcebergStreamReader(self.options, schema)

    def streamWriter(self, schema: T.StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "pyiceberg stream sink is append-only "
                "(outputMode append)"
            )
        return _PyIcebergStreamWriter(self.options, schema)


def register(spark: "SparkSession") -> None:
    """Idempotent ``spark.dataSource.register`` of the pyiceberg
    format (same contract as pydelta/pyavro register).

    Also enables ``spark.sql.python.filterPushdown.enabled``: because
    ``_PyIcebergReader`` implements ``pushFilters``, any session with
    the conf off fails every batch ``format('pyiceberg')`` read with
    DATA_SOURCE_PUSHDOWN_DISABLED. The conf is only flipped when it
    still holds its false DEFAULT — a session whose user explicitly
    set it to false keeps their choice (same guard as
    pydelta_source.register).
    """
    from .pushdown_conf import ensure_filter_pushdown

    ensure_filter_pushdown(spark)
    spark.dataSource.register(PyIcebergDataSource)
