"""Pure-Python Avro object-container codec — executable AVRO tables
without the spark-avro DataSource jar.

Why this exists: the reference reads and writes AVRO tables
(/root/reference/uchelper/dataframe.py:222-223, 414-425; exercised by
tests/test_dataframes.py:20-28), but this environment ships neither
the spark-avro jar nor network access to fetch one (the probe is
documented in tests/test_format_gates.py). The Avro object container
file format is a public, stable specification
(https://avro.apache.org/docs/1.11.1/specification/), so this module
implements the subset the catalog's type system needs, and io.py
falls back to it automatically when the JVM source is absent.

Scale design:

- **Read is distributed per file**: a ``binaryFile`` scan lists and
  ships whole files to executors, and an Arrow-batched
  ``mapInPandas`` decodes each file into rows. The JVM spark-avro
  source — preferred automatically when present — additionally
  splits single large files at block boundaries; the fallback's unit
  of parallelism is the file, which matches how Avro data lakes are
  laid out (many container files per table). ``binaryFile`` caps
  individual files at 2 GiB — far above the single-file tables this
  layout serves.
- **Single-file write is inherently single-writer** (it produces one
  ``.avro`` file — reference parity: Polars ``write_avro`` does the
  same from one in-memory frame). The writer streams the collected
  rows through ``toLocalIterator`` in blocks, so driver memory holds
  one block, not the table.
- **Directory-table write is fully distributed**: each input
  partition encodes its rows into its own container file via
  ``mapInPandas`` — no shuffle, no driver materialization.

Supported types (both directions): boolean, int (byte/short/int),
long, float, double, string, binary, date, timestamp
(timestamp-micros), timestamp_ntz (local-timestamp-micros),
decimal(p,s), array, map<string,*>, nested struct; every field
nullable via ``["null", T]`` unions.
"""

from __future__ import annotations

import datetime
import io as _pyio
import json
import os
import struct
import uuid
import zlib
from decimal import Decimal
from typing import Any, Callable, Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)

# ---------------------------------------------------------------------------
# Schema conversion
# ---------------------------------------------------------------------------

_PRIMITIVE_TO_AVRO = {
    T.BooleanType: "boolean",
    T.ByteType: "int",
    T.ShortType: "int",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
}


def spark_type_to_avro(dt: T.DataType, name_hint: str = "r") -> Any:
    """Spark DataType → Avro schema fragment (JSON-able)."""
    for cls, avro in _PRIMITIVE_TO_AVRO.items():
        if isinstance(dt, cls):
            return avro
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        items = spark_type_to_avro(dt.elementType, name_hint + "_item")
        return {
            "type": "array",
            "items": ["null", items] if dt.containsNull else items,
        }
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError("Avro maps require string keys")
        values = spark_type_to_avro(dt.valueType, name_hint + "_value")
        return {
            "type": "map",
            "values": ["null", values] if dt.valueContainsNull else values,
        }
    if isinstance(dt, T.StructType):
        return {
            "type": "record",
            "name": name_hint,
            "fields": [
                {
                    "name": f.name,
                    "type": ["null", spark_type_to_avro(f.dataType, name_hint + "_" + f.name)]
                    if f.nullable
                    else spark_type_to_avro(f.dataType, name_hint + "_" + f.name),
                }
                for f in dt.fields
            ],
        }
    raise ValueError(f"Unsupported Spark type for Avro: {dt}")


def schema_to_avro(schema: T.StructType, name: str = "topLevelRecord") -> dict:
    return spark_type_to_avro(schema, name)


def avro_type_to_spark(sc: Any) -> Tuple[T.DataType, bool]:
    """Avro schema fragment → (Spark DataType, nullable)."""
    if isinstance(sc, list):  # union
        branches = [b for b in sc if b != "null"]
        if len(branches) != 1:
            raise ValueError(f"Only [null, T] unions supported, got {sc}")
        dt, _ = avro_type_to_spark(branches[0])
        return dt, True
    if isinstance(sc, str):
        return {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "string": T.StringType(),
            "bytes": T.BinaryType(),
            "null": T.NullType(),
        }[sc], False
    t = sc["type"]
    logical = sc.get("logicalType")
    if logical == "date":
        return T.DateType(), False
    if logical == "timestamp-micros":
        return T.TimestampType(), False
    if logical == "timestamp-millis":
        return T.TimestampType(), False
    if logical == "local-timestamp-micros":
        return T.TimestampNTZType(), False
    if logical == "decimal":
        return T.DecimalType(sc["precision"], sc["scale"]), False
    if t == "array":
        dt, nullable = avro_type_to_spark(sc["items"])
        return T.ArrayType(dt, nullable), False
    if t == "map":
        dt, nullable = avro_type_to_spark(sc["values"])
        return T.MapType(T.StringType(), dt, nullable), False
    if t == "record":
        fields = []
        for f in sc["fields"]:
            dt, nullable = avro_type_to_spark(f["type"])
            fields.append(T.StructField(f["name"], dt, nullable))
        return T.StructType(fields), False
    return avro_type_to_spark(t)  # {"type": "string"} style wrapper


# ---------------------------------------------------------------------------
# Binary encoding (writer)
# ---------------------------------------------------------------------------


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _encoder_for(sc: Any) -> Callable[[bytearray, Any], None]:
    """Build a closure encoding one value of Avro schema ``sc``."""
    if isinstance(sc, list):  # [null, T] union
        branches = [b for b in sc if b != "null"]
        null_idx = sc.index("null")
        val_idx = 1 - null_idx
        inner = _encoder_for(branches[0])

        def enc_union(out: bytearray, v: Any) -> None:
            if v is None:
                _write_long(out, null_idx)
            else:
                _write_long(out, val_idx)
                inner(out, v)

        return enc_union
    if isinstance(sc, str):
        if sc in ("int", "long"):
            return _write_long
        if sc == "boolean":
            return lambda out, v: out.append(1 if v else 0)
        if sc == "float":
            return lambda out, v: out.extend(struct.pack("<f", v))
        if sc == "double":
            return lambda out, v: out.extend(struct.pack("<d", v))
        if sc == "string":

            def enc_str(out: bytearray, v: Any) -> None:
                raw = v.encode("utf-8")
                _write_long(out, len(raw))
                out.extend(raw)

            return enc_str
        if sc == "bytes":

            def enc_bytes(out: bytearray, v: Any) -> None:
                raw = bytes(v)
                _write_long(out, len(raw))
                out.extend(raw)

            return enc_bytes
        if sc == "null":
            return lambda out, v: None
        raise ValueError(f"Unsupported Avro primitive {sc}")
    t = sc["type"]
    logical = sc.get("logicalType")
    if logical == "date":
        return lambda out, v: _write_long(out, (v - _EPOCH_DATE).days)
    if logical in ("timestamp-micros", "local-timestamp-micros"):

        def enc_ts(out: bytearray, v: Any) -> None:
            if v.tzinfo is not None:
                v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            delta = v - _EPOCH_DT
            _write_long(
                out,
                (delta.days * 86400 + delta.seconds) * 1_000_000
                + delta.microseconds,
            )

        return enc_ts
    if logical == "decimal":
        scale = sc["scale"]

        def enc_dec(out: bytearray, v: Any) -> None:
            unscaled = int(Decimal(v).scaleb(scale).to_integral_value())
            nbytes = max(1, (unscaled.bit_length() + 8) // 8)
            raw = unscaled.to_bytes(nbytes, "big", signed=True)
            _write_long(out, len(raw))
            out.extend(raw)

        return enc_dec
    if t == "array":
        item_enc = _encoder_for(sc["items"])

        def enc_array(out: bytearray, v: Any) -> None:
            seq = list(v)
            if seq:
                _write_long(out, len(seq))
                for item in seq:
                    item_enc(out, item)
            _write_long(out, 0)

        return enc_array
    if t == "map":
        val_enc = _encoder_for(sc["values"])

        def enc_map(out: bytearray, v: Any) -> None:
            items = dict(v)
            if items:
                _write_long(out, len(items))
                for k, val in items.items():
                    raw = k.encode("utf-8")
                    _write_long(out, len(raw))
                    out.extend(raw)
                    val_enc(out, val)
            _write_long(out, 0)

        return enc_map
    if t == "record":
        field_encs = [_encoder_for(f["type"]) for f in sc["fields"]]
        field_names = [f["name"] for f in sc["fields"]]
        nfields = len(field_encs)

        def enc_record(out: bytearray, v: Any) -> None:
            # v: sequence aligned with field order (Row, tuple, list)
            # or a name→value mapping (pyarrow .to_pylist() structs)
            if isinstance(v, dict):
                for i in range(nfields):
                    field_encs[i](out, v.get(field_names[i]))
            else:
                for i in range(nfields):
                    field_encs[i](out, v[i])

        return enc_record
    return _encoder_for(t)


# ---------------------------------------------------------------------------
# Binary decoding (reader)
# ---------------------------------------------------------------------------


def _read_long(buf: bytes, pos: int) -> Tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos  # un-zigzag


def _decoder_for(sc: Any) -> Callable[[bytes, int], Tuple[Any, int]]:
    if isinstance(sc, list):
        decoders = [None if b == "null" else _decoder_for(b) for b in sc]

        def dec_union(buf: bytes, pos: int) -> Tuple[Any, int]:
            idx, pos = _read_long(buf, pos)
            d = decoders[idx]
            if d is None:
                return None, pos
            return d(buf, pos)

        return dec_union
    if isinstance(sc, str):
        if sc in ("int", "long"):
            return _read_long
        if sc == "boolean":
            return lambda buf, pos: (buf[pos] == 1, pos + 1)
        if sc == "float":
            return lambda buf, pos: (
                struct.unpack_from("<f", buf, pos)[0],
                pos + 4,
            )
        if sc == "double":
            return lambda buf, pos: (
                struct.unpack_from("<d", buf, pos)[0],
                pos + 8,
            )
        if sc == "string":

            def dec_str(buf: bytes, pos: int) -> Tuple[str, int]:
                n, pos = _read_long(buf, pos)
                return buf[pos : pos + n].decode("utf-8"), pos + n

            return dec_str
        if sc == "bytes":

            def dec_bytes(buf: bytes, pos: int) -> Tuple[bytes, int]:
                n, pos = _read_long(buf, pos)
                return bytes(buf[pos : pos + n]), pos + n

            return dec_bytes
        if sc == "null":
            return lambda buf, pos: (None, pos)
        raise ValueError(f"Unsupported Avro primitive {sc}")
    t = sc["type"]
    logical = sc.get("logicalType")
    if logical == "date":

        def dec_date(buf: bytes, pos: int) -> Tuple[datetime.date, int]:
            days, pos = _read_long(buf, pos)
            return _EPOCH_DATE + datetime.timedelta(days=days), pos

        return dec_date
    if logical in ("timestamp-micros", "local-timestamp-micros", "timestamp-millis"):
        mult = 1000 if logical == "timestamp-millis" else 1

        def dec_ts(buf: bytes, pos: int) -> Tuple[datetime.datetime, int]:
            us, pos = _read_long(buf, pos)
            return _EPOCH_DT + datetime.timedelta(microseconds=us * mult), pos

        return dec_ts
    if logical == "decimal":
        scale = sc["scale"]

        def dec_dec(buf: bytes, pos: int) -> Tuple[Decimal, int]:
            n, pos = _read_long(buf, pos)
            unscaled = int.from_bytes(buf[pos : pos + n], "big", signed=True)
            return Decimal(unscaled).scaleb(-scale), pos + n

        return dec_dec
    if t == "array":
        item_dec = _decoder_for(sc["items"])

        def dec_array(buf: bytes, pos: int) -> Tuple[list, int]:
            out: list = []
            while True:
                count, pos = _read_long(buf, pos)
                if count == 0:
                    return out, pos
                if count < 0:  # block with byte-size prefix
                    count = -count
                    _, pos = _read_long(buf, pos)
                for _ in range(count):
                    v, pos = item_dec(buf, pos)
                    out.append(v)

        return dec_array
    if t == "map":
        val_dec = _decoder_for(sc["values"])

        def dec_map(buf: bytes, pos: int) -> Tuple[dict, int]:
            out: dict = {}
            while True:
                count, pos = _read_long(buf, pos)
                if count == 0:
                    return out, pos
                if count < 0:
                    count = -count
                    _, pos = _read_long(buf, pos)
                for _ in range(count):
                    n, pos = _read_long(buf, pos)
                    k = buf[pos : pos + n].decode("utf-8")
                    pos += n
                    out[k], pos = val_dec(buf, pos)

        return dec_map
    if t == "record":
        field_decs = [_decoder_for(f["type"]) for f in sc["fields"]]

        def dec_record(buf: bytes, pos: int) -> Tuple[tuple, int]:
            vals = []
            for d in field_decs:
                v, pos = d(buf, pos)
                vals.append(v)
            return tuple(vals), pos

        return dec_record
    return _decoder_for(t)


# ---------------------------------------------------------------------------
# Object container file layer
# ---------------------------------------------------------------------------


def _write_header(fh, avro_schema: dict, codec: str) -> bytes:
    sync = os.urandom(16)
    out = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(avro_schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        kraw = k.encode()
        _write_long(out, len(kraw))
        out.extend(kraw)
        _write_long(out, len(v))
        out.extend(v)
    _write_long(out, 0)
    out.extend(sync)
    fh.write(bytes(out))
    return sync


def _write_block(fh, sync: bytes, codec: str, count: int, payload: bytes) -> None:
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    head = bytearray()
    _write_long(head, count)
    _write_long(head, len(payload))
    fh.write(bytes(head))
    fh.write(payload)
    fh.write(sync)


def write_container(
    path: str,
    avro_schema: dict,
    rows: Iterator[Any],
    codec: str = "deflate",
    block_rows: int = 4096,
) -> int:
    """Stream ``rows`` (sequences aligned to the record's field order)
    into an Avro object container file. Returns the row count.
    Memory: one block (``block_rows`` rows) at a time."""
    enc = _encoder_for(avro_schema)
    total = 0
    with open(path, "wb") as fh:
        sync = _write_header(fh, avro_schema, codec)
        buf = bytearray()
        n = 0
        for row in rows:
            enc(buf, row)
            n += 1
            if n >= block_rows:
                _write_block(fh, sync, codec, n, bytes(buf))
                total += n
                buf.clear()
                n = 0
        if n:
            _write_block(fh, sync, codec, n, bytes(buf))
            total += n
    return total


def read_header(raw: bytes) -> Tuple[dict, str, bytes, int]:
    """→ (avro_schema, codec, sync_marker, offset_after_header)."""
    if raw[:4] != MAGIC:
        raise ValueError("Not an Avro object container file")
    pos = 4
    meta: dict = {}
    while True:
        count, pos = _read_long(raw, pos)
        if count == 0:
            break
        if count < 0:
            count = -count
            _, pos = _read_long(raw, pos)
        for _ in range(count):
            n, pos = _read_long(raw, pos)
            k = raw[pos : pos + n].decode()
            pos += n
            n, pos = _read_long(raw, pos)
            meta[k] = raw[pos : pos + n]
            pos += n
    sync = raw[pos : pos + 16]
    pos += 16
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"Unsupported Avro codec {codec!r}")
    return schema, codec, sync, pos


def read_container(raw: bytes) -> Tuple[dict, List[tuple]]:
    """Decode a whole container file → (avro_schema, rows)."""
    schema, codec, sync, pos = read_header(raw)
    dec = _decoder_for(schema)
    rows: List[tuple] = []
    end = len(raw)
    while pos < end:
        count, pos = _read_long(raw, pos)
        size, pos = _read_long(raw, pos)
        block = raw[pos : pos + size]
        pos += size
        if raw[pos : pos + 16] != sync:
            raise ValueError("Avro sync marker mismatch (corrupt file)")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bpos = 0
        for _ in range(count):
            row, bpos = dec(block, bpos)
            rows.append(row)
    return schema, rows


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def _strip_scheme(path: str) -> str:
    return path[len("file://") :] if path.startswith("file://") else path


def _avro_files(path: str) -> List[str]:
    path = _strip_scheme(path)
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        )
    return [path]


def read_avro(
    spark: SparkSession, path: str, schema: Optional[T.StructType] = None
) -> DataFrame:
    """Distributed Avro read: binaryFile listing + per-file
    Arrow-batched decode. Schema comes from the first file's header
    (writer schema is authoritative, like the JVM source); pass
    ``schema`` to project/validate against catalog columns."""
    import pandas as pd

    files = _avro_files(path)
    if not files:
        raise FileNotFoundError(f"No Avro files at {path}")
    with open(files[0], "rb") as fh:
        head = fh.read(1 << 20)
    avro_schema, _, _, _ = read_header(head)
    spark_schema, _ = avro_type_to_spark(avro_schema)
    if not isinstance(spark_schema, T.StructType):
        raise ValueError("Top-level Avro schema must be a record")
    names = [f.name for f in spark_schema.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                _, rows = read_container(bytes(content))
                yield pd.DataFrame.from_records(rows, columns=names).astype(
                    object
                )

    binary = spark.read.format("binaryFile").load(
        [f"file://{f}" for f in files]
    )
    out = binary.select("content").mapInPandas(decode, schema=spark_schema)
    if schema is not None:
        out = out.select(
            *[out[f.name].cast(f.dataType).alias(f.name) for f in schema.fields]
        )
    return out


def write_avro_single(df: DataFrame, dest_file: str, codec: str = "deflate") -> None:
    """One ``.avro`` container file (single-writer by definition).
    Rows stream through ``toLocalIterator`` so the driver holds one
    encode block, not the table. Written to a temp name then moved
    into place atomically."""
    dest_file = _strip_scheme(dest_file)
    avro_schema = schema_to_avro(df.schema)
    tmp = dest_file + f".__tmp_{uuid.uuid4().hex}"
    try:
        write_container(tmp, avro_schema, df.toLocalIterator(), codec=codec)
        os.replace(tmp, dest_file)
    except Exception:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def write_avro_dir(df: DataFrame, dest_dir: str, codec: str = "deflate") -> None:
    """Directory table: each partition writes its own container file —
    fully distributed, no shuffle. Executors must see the table
    filesystem (true for this engine's file:// tables; on a cluster
    that means a shared mount, which is the same contract the
    built-in file sources have). Arrow batches (``mapInArrow``) keep
    integer/null fidelity — no pandas NaN coercion in the path."""
    import pyarrow as pa

    dest_dir = _strip_scheme(dest_dir)
    os.makedirs(dest_dir, exist_ok=True)
    avro_schema = schema_to_avro(df.schema)
    names = df.columns

    def write_part(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        rows: List[tuple] = []
        for batch in batches:
            for rec in batch.to_pylist():
                rows.append(tuple(rec[c] for c in names))
        if rows:
            part = os.path.join(dest_dir, f"part-{uuid.uuid4().hex}.avro")
            write_container(part, avro_schema, iter(rows), codec=codec)
        yield pa.RecordBatch.from_pydict({"rows": [len(rows)]})

    written = (
        df.mapInArrow(write_part, schema="rows long")
        .agg({"rows": "sum"})
        .collect()[0][0]
    )
    if not written:
        # no data partitions → still leave a valid (empty) container
        # so readers can recover the schema
        write_container(
            os.path.join(dest_dir, f"part-{uuid.uuid4().hex}.avro"),
            avro_schema,
            iter(()),
            codec=codec,
        )
