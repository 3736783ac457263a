"""``spark.read/write.format("pyavro")`` — the pure-Python Avro
object-container codec (sources/avro_py.py) surfaced as a REGISTERED
Spark data source via the Python Data Source API, completing the
format-dispatch story next to ``pydelta``: AVRO tables participate in
``spark.read.format(...)`` without the spark-avro jar.

- batch read: one input partition PER CONTAINER FILE (scan
  parallelism = file count — the layout contract of Avro data lakes),
  header-derived schema (writer schema is authoritative, like the JVM
  source), Arrow RecordBatch transfer.
- batch write: ``DataSourceArrowWriter`` — each task encodes its
  Arrow batches into its own container file (deflate blocks);
  overwrite deletes the previous file set in the driver-side commit,
  append keeps it. Like every log-less file format, directory
  visibility is rename-granular per file, not transactional — the
  transactional path is ``pydelta``.

The reference reads/writes Avro through Polars behind its format enum
(/root/reference/uchelper/dataframe.py:222-223, 414-425); this module
is the Spark-native equivalent of that dispatch. io.py's
binaryFile+mapInPandas path (read_avro) remains the bulk default;
this source is the format-string API.
"""

from __future__ import annotations

import os
import uuid
from typing import TYPE_CHECKING, List, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)

from .avro_py import (
    _avro_files,
    _strip_scheme,
    avro_type_to_spark,
    read_container,
    read_header,
    schema_to_avro,
    write_container,
)

if TYPE_CHECKING:
    from pyspark.sql import SparkSession


def _required_path(options: dict) -> str:
    path = options.get("path")
    if not path:
        raise ValueError("pyavro requires a path: .load('/table/dir')")
    return _strip_scheme(path)


def _header_schema(path: str) -> T.StructType:
    files = _avro_files(path)
    if not files:
        raise FileNotFoundError(f"No Avro files at {path}")
    with open(files[0], "rb") as fh:
        head = fh.read(1 << 20)
    avro_schema, _, _, _ = read_header(head)
    spark_schema, _ = avro_type_to_spark(avro_schema)
    if not isinstance(spark_schema, T.StructType):
        raise ValueError("Top-level Avro schema must be a record")
    return spark_schema


class _PyAvroReader(DataSourceReader):
    def __init__(self, options: dict, schema: T.StructType):
        self._path = _required_path(options)
        self._schema = schema

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(f) for f in _avro_files(self._path)]

    def read(self, partition: InputPartition):
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        with open(partition.value, "rb") as fh:
            raw = fh.read()
        # Decode against THIS file's own writer schema and assemble
        # columns by field NAME: a container appended later may order
        # its fields differently from the first file (whose header
        # fixed the read schema) — a positional zip would silently
        # transpose values into the wrong columns. Fields the file
        # lacks (pre-evolution writers) surface as NULL, matching the
        # explicit-schema parquet/pydelta semantics.
        avro_schema, _, _, _ = read_header(raw)
        file_names = [f["name"] for f in avro_schema.get("fields", [])]
        _, rows = read_container(raw)
        if not rows:
            return
        if not set(file_names) & {f.name for f in target}:
            raise ValueError(
                f"Avro file {partition.value} shares no fields with the "
                f"read schema {[f.name for f in target]} (file fields: "
                f"{file_names})"
            )
        by_name = dict(zip(file_names, zip(*rows)))
        n = len(rows)
        arrays = [
            pa.array(list(by_name[field.name]), type=field.type)
            if field.name in by_name
            else pa.nulls(n, field.type)
            for field in target
        ]
        table = pa.Table.from_arrays(arrays, schema=target)
        yield from table.to_batches(max_chunksize=1 << 16)


class _FileCommit(WriterCommitMessage):
    def __init__(self, rel: str):
        self.rel = rel


class _PyAvroWriter(DataSourceArrowWriter):
    def __init__(self, options: dict, schema: T.StructType, overwrite: bool):
        self._path = _required_path(options)
        self._schema = schema
        self._overwrite = overwrite

    def write(self, iterator) -> _FileCommit:
        names = [f.name for f in self._schema.fields]
        avro_schema = schema_to_avro(self._schema)
        rows: list = []
        for batch in iterator:
            for rec in batch.to_pylist():
                rows.append(tuple(rec[c] for c in names))
        if not rows:
            return _FileCommit("")
        rel = f"part-{uuid.uuid4().hex}.avro"
        os.makedirs(self._path, exist_ok=True)
        write_container(
            os.path.join(self._path, rel), avro_schema, iter(rows)
        )
        return _FileCommit(rel)

    def commit(self, messages) -> None:
        new = {m.rel for m in messages if m is not None and m.rel}
        if self._overwrite:
            for f in _avro_files(self._path):
                if os.path.basename(f) not in new:
                    os.unlink(f)
        if not new and not _avro_files(self._path):
            # empty result over a fresh table: leave a schema-bearing
            # empty container so readers can recover the schema
            os.makedirs(self._path, exist_ok=True)
            write_container(
                os.path.join(self._path, f"part-{uuid.uuid4().hex}.avro"),
                schema_to_avro(self._schema),
                iter(()),
            )

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None and m.rel:
                try:
                    os.unlink(os.path.join(self._path, m.rel))
                except FileNotFoundError:
                    pass


class PyAvroDataSource(DataSource):
    """``spark.dataSource.register(PyAvroDataSource)`` then
    ``spark.read.format("pyavro").load(dir)`` /
    ``df.write.format("pyavro").mode(...).save(dir)``."""

    @classmethod
    def name(cls) -> str:
        return "pyavro"

    def schema(self) -> T.StructType:
        return _header_schema(_required_path(self.options))

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return _PyAvroReader(self.options, schema)

    def writer(self, schema: T.StructType, overwrite: bool) -> _PyAvroWriter:
        return _PyAvroWriter(self.options, schema, overwrite)


def register(spark: "SparkSession") -> None:
    """Idempotent session-level registration of the pyavro format.

    ``_PyAvroReader`` has no ``pushFilters`` today, but the conf guard
    is applied anyway so the reader can grow pushdown without breaking
    default sessions (same contract as pydelta/pyiceberg register).
    """
    from .pushdown_conf import ensure_filter_pushdown

    ensure_filter_pushdown(spark)
    spark.dataSource.register(PyAvroDataSource)
