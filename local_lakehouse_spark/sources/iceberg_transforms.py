"""Iceberg partition TRANSFORMS (spec "Partition Transforms" +
Appendix B "32-bit Hash Requirements").

Reference behavior modeled: the reference engine delegates Iceberg
partitioning to its table-format library; this module re-implements
the public spec directly so transform-partitioned tables plan and
prune in pure PySpark.

Three consumers:

- **writer** (iceberg_py.write_iceberg): ``spark_transform_column``
  builds the DERIVED partition column a transform partitions the
  data layout by. Everything except ``bucket`` is a built-in Spark
  expression (JVM-side, codegen); bucket needs Iceberg's exact
  murmur3_x86_32 over the spec's byte encodings — Spark's built-in
  ``hash()`` is murmur3 with seed 42 over DIFFERENT encodings (ints
  hash as 4 bytes, not widened to long), so bucket is an
  Arrow-vectorized pandas UDF (numpy-vectorized for the integral
  family; per-row only for strings/binary). Write-path only — reads
  never evaluate it row-level.
- **scan planning** (iceberg_py.prune_data_files): ``prune_keep``
  decides from a file's transform partition VALUE whether any row
  can satisfy a conjunct. bucket prunes equality points; truncate
  and the temporal transforms are ORDER-PRESERVING (monotonic
  non-decreasing), so ``v < lit  =>  T(v) <= T(lit)`` and range
  conjuncts prune too. Files keep on any doubt — pruning is an
  optimization, never the correctness mechanism.
- **literal side**: ``apply_transform`` evaluates a transform on a
  Python literal (the filter's right-hand side) for the comparisons
  above.

The murmur3 implementation is verified against the spec's published
Appendix B test vectors in tests/test_iceberg_transforms.py.
"""

from __future__ import annotations

import datetime as _dt
import re
import struct
import uuid as _uuid
from typing import Optional, Tuple

from ..exceptions import UnsupportedOperationError

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)
_M32 = 0xFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 (public domain algorithm, Austin Appleby) —
    returns a SIGNED int32, the Java convention the Iceberg spec's
    test vectors use."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _M32
    n = len(data)
    nblocks = n - n % 4
    for i in range(0, nblocks, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[nblocks:]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h & 0x80000000 else h


def _to_micros(value) -> int:
    if isinstance(value, _dt.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc).replace(
                tzinfo=None
            )
        delta = value - _EPOCH_DT
        return (
            delta.days * 86_400_000_000
            + delta.seconds * 1_000_000
            + delta.microseconds
        )
    return int(value)


def _to_days(value) -> int:
    if isinstance(value, _dt.datetime):
        return _to_micros(value) // 86_400_000_000
    if isinstance(value, _dt.date):
        return (value - _EPOCH_DATE).days
    return int(value)


_DEC_RE = re.compile(r"^decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)$")


def bucket_hash(value: object, ice_type: str) -> Optional[int]:
    """Spec Appendix B hash of one value: int/long/date/time/
    timestamp widen to an 8-byte little-endian long; strings hash
    their UTF-8 bytes; uuid its 16 big-endian bytes; decimal the
    minimal two's-complement big-endian of its unscaled value.
    float/double/boolean may NOT be bucketed (spec rule)."""
    if value is None:
        return None
    t = ice_type
    if t in ("int", "long"):
        data = struct.pack("<q", int(value))
    elif t == "date":
        data = struct.pack("<q", _to_days(value))
    elif t in ("timestamp", "timestamptz", "time"):
        data = struct.pack("<q", _to_micros(value))
    elif t == "string":
        data = str(value).encode("utf-8")
    elif t == "uuid":
        u = value if isinstance(value, _uuid.UUID) else _uuid.UUID(str(value))
        data = u.bytes
    elif t == "binary" or t.startswith("fixed"):
        data = bytes(value)
    elif _DEC_RE.match(t):
        from decimal import Decimal

        scale = int(_DEC_RE.match(t).group(2))
        unscaled = int(Decimal(value).scaleb(scale).to_integral_value())
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        data = unscaled.to_bytes(nbytes, "big", signed=True)
        while (
            len(data) > 1
            and data[0] in (0x00, 0xFF)
            and ((data[1] ^ data[0]) & 0x80) == 0
        ):
            data = data[1:]  # minimal two's-complement
    else:
        raise UnsupportedOperationError(
            f"Iceberg bucket transform undefined for type {t!r}"
        )
    return murmur3_32(data)


def parse_transform(transform: str) -> Tuple[str, Optional[int]]:
    """``"bucket[4]"`` -> ``("bucket", 4)``; plain names pass
    through with a None parameter."""
    m = re.match(r"^(bucket|truncate)\[(\d+)\]$", transform)
    if m:
        return m.group(1), int(m.group(2))
    return transform, None


def parse_partition_by(entry: str) -> Tuple[str, str]:
    """One user-facing ``partition_by`` element -> ``(source column,
    spec transform string)``. Accepted shapes: bare column
    (identity), ``bucket(N, col)``, ``truncate(W, col)``, and
    ``days(col)`` / ``months(col)`` / ``years(col)`` / ``hours(col)``
    (singular forms too) — iceberg-spark's partitionedBy surface."""
    s = entry.strip()
    m = re.match(r"^(bucket|truncate)\(\s*(\d+)\s*,\s*(\w+)\s*\)$", s)
    if m:
        return m.group(3), f"{m.group(1)}[{m.group(2)}]"
    m = re.match(
        r"^(years?|months?|days?|hours?|date|date_hour)\(\s*(\w+)\s*\)$", s
    )
    if m:
        kind = {
            "year": "year",
            "years": "year",
            "month": "month",
            "months": "month",
            "day": "day",
            "days": "day",
            "date": "day",
            "hour": "hour",
            "hours": "hour",
            "date_hour": "hour",
        }[m.group(1)]
        return m.group(2), kind
    if re.match(r"^\w+$", s):
        return s, "identity"
    raise UnsupportedOperationError(
        f"unparseable partition_by entry {entry!r}"
    )


def spec_field_name(col: str, transform: str) -> str:
    """iceberg-core's default partition field names."""
    kind, param = parse_transform(transform)
    return {
        "identity": col,
        "bucket": f"{col}_bucket",
        "truncate": f"{col}_trunc",
        "year": f"{col}_year",
        "month": f"{col}_month",
        "day": f"{col}_day",
        "hour": f"{col}_hour",
    }.get(kind, f"{col}_{kind}")


def result_ice_type(transform: str, src_type: str) -> str:
    """The Iceberg type of the transform's partition value. ``day``
    is spec-typed ``date``; this writer stores it as its int
    days-from-epoch representation (what the avro layer physically
    encodes either way)."""
    kind, _ = parse_transform(transform)
    if kind == "identity":
        return src_type
    if kind == "truncate":
        return src_type
    if kind == "bucket":
        return "int"
    if kind in ("year", "month", "day", "hour"):
        return "int"
    raise UnsupportedOperationError(
        f"unsupported Iceberg partition transform {transform!r}"
    )


_TEMPORAL_SRC = ("date", "timestamp", "timestamptz")


def validate(transform: str, src_type: str) -> None:
    kind, param = parse_transform(transform)
    if kind == "identity":
        return
    if kind == "bucket":
        if src_type in ("float", "double", "boolean") or (
            src_type
            not in (
                "int",
                "long",
                "date",
                "time",
                "timestamp",
                "timestamptz",
                "string",
                "uuid",
                "binary",
            )
            and not src_type.startswith("fixed")
            and not _DEC_RE.match(src_type)
        ):
            raise UnsupportedOperationError(
                f"bucket transform undefined for {src_type!r}"
            )
        return
    if kind == "truncate":
        if src_type not in ("int", "long", "string") and not _DEC_RE.match(
            src_type
        ):
            raise UnsupportedOperationError(
                f"truncate transform undefined for {src_type!r}"
            )
        return
    if kind in ("year", "month", "day"):
        if src_type not in _TEMPORAL_SRC:
            raise UnsupportedOperationError(
                f"{kind} transform needs a date/timestamp source, got "
                f"{src_type!r}"
            )
        return
    if kind == "hour":
        if src_type not in ("timestamp", "timestamptz"):
            raise UnsupportedOperationError(
                f"hour transform needs a timestamp source, got "
                f"{src_type!r}"
            )
        return
    raise UnsupportedOperationError(
        f"unsupported Iceberg partition transform {transform!r}"
    )


def apply_transform(transform: str, value: object, src_type: str) -> object:
    """Evaluate a transform on one Python value (filter literals at
    plan time; also the scalar oracle for the vectorized writer
    path)."""
    if value is None:
        return None
    kind, param = parse_transform(transform)
    if kind == "identity":
        return value
    if kind == "bucket":
        return (bucket_hash(value, src_type) & 0x7FFFFFFF) % param
    if kind == "truncate":
        if src_type in ("int", "long"):
            return int(value) - (int(value) % param)  # floored mod
        if src_type == "string":
            return str(value)[:param]
        if _DEC_RE.match(src_type):
            from decimal import Decimal

            scale = int(_DEC_RE.match(src_type).group(2))
            unscaled = int(
                Decimal(value).scaleb(scale).to_integral_value()
            )
            return Decimal(unscaled - (unscaled % param)).scaleb(-scale)
        raise UnsupportedOperationError(
            f"truncate undefined for {src_type!r}"
        )
    if kind == "day":
        return _to_days(value)
    if kind == "hour":
        return _to_micros(value) // 3_600_000_000
    if kind in ("year", "month"):
        if isinstance(value, (_dt.date, _dt.datetime)):
            y, mo = value.year, value.month
        elif src_type == "date":
            d = _EPOCH_DATE + _dt.timedelta(days=int(value))
            y, mo = d.year, d.month
        else:
            d = _EPOCH_DT + _dt.timedelta(
                microseconds=int(value)
            )
            y, mo = d.year, d.month
        return (y - 1970) if kind == "year" else (y - 1970) * 12 + mo - 1
    raise UnsupportedOperationError(
        f"unsupported Iceberg partition transform {transform!r}"
    )


# Order-preserving transforms: v1 <= v2  =>  T(v1) <= T(v2), so range
# conjuncts prune on the transformed literal. bucket is NOT in this
# set (hash destroys order) — it prunes equality points only.
_MONOTONIC = ("identity", "truncate", "year", "month", "day", "hour")


def prune_keep(
    transform: str, src_type: str, pv: object, op: str, literal: object
) -> bool:
    """Can any row in a file whose transform partition value is
    ``pv`` satisfy ``row.col <op> literal``? True = keep the file.
    Conservative: unknown ops / incomparable literals keep."""
    kind, _param = parse_transform(transform)
    if pv is None:
        # null partition: every source value in the file is NULL, so
        # no comparison conjunct can hold
        return op not in ("=", "==", "<", "<=", ">", ">=")
    try:
        tl = apply_transform(transform, literal, src_type)
    except Exception:
        return True
    if tl is None:
        return True
    try:
        if kind == "bucket":
            if op in ("=", "=="):
                return pv == tl
            return True  # hash order is meaningless
        if kind in _MONOTONIC:
            return {
                "=": pv == tl,
                "==": pv == tl,
                # v < lit  =>  T(v) <= T(lit): only files at or below
                # the literal's image can hold such rows
                "<": pv <= tl,
                "<=": pv <= tl,
                ">": pv >= tl,
                ">=": pv >= tl,
            }.get(op, True)
    except TypeError:
        return True
    return True


def spark_transform_column(transform: str, col: str, src_type: str):
    """A Spark Column computing the transform of ``col`` — the
    derived layout column the writer partitions by. Built-in
    (JVM-side) expressions for everything except bucket, which needs
    Iceberg's exact murmur3 encodings (numpy-vectorized pandas UDF;
    write path only)."""
    from pyspark.sql import functions as F

    kind, param = parse_transform(transform)
    c = F.col(col)
    if kind == "identity":
        return c
    if kind == "truncate":
        if src_type in ("int", "long"):
            return (c - F.pmod(c, F.lit(param))).cast(
                "int" if src_type == "int" else "long"
            )
        if src_type == "string":
            return F.substring(c, 1, param)
        raise UnsupportedOperationError(
            f"truncate write path undefined for {src_type!r}"
        )
    if kind == "day":
        if src_type == "date":
            return F.datediff(c, F.lit("1970-01-01")).cast("int")
        # session tz is UTC (session.py), so the UTC epoch-day IS the
        # wall-clock date; the cast covers TIMESTAMP_NTZ sources
        # (unix_micros accepts only TIMESTAMP)
        return F.floor(
            F.unix_micros(c.cast("timestamp")) / F.lit(86_400_000_000)
        ).cast("int")
    if kind == "hour":
        return F.floor(
            F.unix_micros(c.cast("timestamp")) / F.lit(3_600_000_000)
        ).cast("int")
    if kind == "year":
        return (F.year(c) - F.lit(1970)).cast("int")
    if kind == "month":
        return (
            (F.year(c) - F.lit(1970)) * F.lit(12) + F.month(c) - F.lit(1)
        ).cast("int")
    if kind == "bucket":
        return _bucket_column(param, col, src_type)
    raise UnsupportedOperationError(
        f"unsupported Iceberg partition transform {transform!r}"
    )


def _bucket_column(n: int, col: str, src_type: str):
    from pyspark.sql import functions as F

    if src_type in ("float", "double", "boolean"):
        raise UnsupportedOperationError(
            f"bucket transform undefined for {src_type!r}"
        )

    @F.pandas_udf("int")
    def _bucket(s):
        import numpy as np
        import pandas as pd

        mask = s.isna()
        if src_type in ("int", "long"):
            vals = s.fillna(0).astype("int64").to_numpy()
            h = _mm3_long_vec(vals)
        elif src_type == "date":
            days = pd.to_datetime(s).map(
                lambda d: (d.date() - _EPOCH_DATE).days
                if d is not None and d == d
                else 0
            )
            h = _mm3_long_vec(days.astype("int64").to_numpy())
        elif src_type in ("timestamp", "timestamptz"):
            micros = (
                pd.to_datetime(s)
                .astype("datetime64[us]")
                .astype("int64")
                .to_numpy()
            )
            micros = np.where(mask.to_numpy(), 0, micros)
            h = _mm3_long_vec(micros)
        else:  # string / binary: per-row (Arrow-batched, write path)
            h = np.array(
                [
                    0
                    if v is None
                    else murmur3_32(
                        v.encode("utf-8") if isinstance(v, str) else bytes(v)
                    )
                    for v in s
                ],
                dtype="int64",
            )
        out = ((h & 0x7FFFFFFF) % n).astype("int64")
        res = pd.array(out, dtype="Int32")
        res[mask.to_numpy()] = None
        return pd.Series(res)

    return _bucket(F.col(col))


def _mm3_long_vec(v):
    """Vectorized murmur3_x86_32 over 8-byte little-endian longs —
    the spec encoding for the whole integral family. Verified
    against the scalar implementation + spec vectors in tests."""
    import numpy as np

    v = v.astype(np.uint64)
    h = np.zeros(v.shape, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for shift in (np.uint64(0), np.uint64(32)):
            k = ((v >> shift) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            k = (k * np.uint32(0xCC9E2D51)).astype(np.uint32)
            k = ((k << np.uint32(15)) | (k >> np.uint32(17))).astype(
                np.uint32
            )
            k = (k * np.uint32(0x1B873593)).astype(np.uint32)
            h = (h ^ k).astype(np.uint32)
            h = ((h << np.uint32(13)) | (h >> np.uint32(19))).astype(
                np.uint32
            )
            h = (h * np.uint32(5) + np.uint32(0xE6546B64)).astype(
                np.uint32
            )
        h = h ^ np.uint32(8)
        h = h ^ (h >> np.uint32(16))
        h = (h * np.uint32(0x85EBCA6B)).astype(np.uint32)
        h = h ^ (h >> np.uint32(13))
        h = (h * np.uint32(0xC2B2AE35)).astype(np.uint32)
        h = h ^ (h >> np.uint32(16))
    return h.astype(np.int64).astype("int64") - (
        (h >> np.uint32(31)).astype("int64") << 32
    )
