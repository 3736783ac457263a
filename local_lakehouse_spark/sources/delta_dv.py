"""Delta Lake deletion-vector codec — pure Python + numpy.

Implements the on-disk deletion-vector (DV) format from the PUBLIC
Delta protocol spec (delta-io/delta PROTOCOL.md, "Deletion Vectors" +
"Deletion Vector Format" appendix). The reference reads DV-bearing
tables through delta-rs (reference `uchelper/dataframe.py:198-199`,
``pl.read_delta``); this module gives the pure-Python Delta reader
(`delta_py.py` / `pydelta_source.py`) the same capability without a
native engine:

- **Z85** (ZeroMQ base85, the alphabet the Delta spec mandates) for
  the UUID in ``storageType="u"`` descriptors and for the whole
  payload of inline (``storageType="i"``) descriptors.
- **RoaringBitmapArray "portable" serialization** — the 64-bit
  extension of RoaringBitmap used by Delta: a 4-byte little-endian
  magic number (1681511377), an 8-byte little-endian count of 32-bit
  bitmaps, then each 32-bit bitmap in the standard RoaringFormatSpec
  portable layout (github.com/RoaringBitmap/RoaringFormatSpec),
  index position = the high 32 bits of the 64-bit row index.
- **DV file layout** for ``storageType`` "u"/"p": a 1-byte format
  version (1), then per stored DV a 4-byte big-endian length, the
  serialized bitmap, and a 4-byte big-endian CRC-32 of the bitmap
  bytes (big-endian because the canonical writer is a Java
  ``DataOutputStream``). The descriptor's ``offset`` points at the
  length word; ``sizeInBytes`` is the bitmap byte length.

Scale note: decoding is O(serialized bytes) with numpy vectorized
container expansion; callers decide WHERE it runs — `delta_py`
decodes driver-side only to build the anti-join side (and ships the
raw descriptor to executors for large cardinalities), and
`pydelta_source` decodes per-file inside its executor-side reader.
"""
from __future__ import annotations

import os
import struct
import uuid as uuid_mod
import zlib
from typing import Iterable

import numpy as np

__all__ = [
    "z85_encode",
    "z85_decode",
    "encode_roaring_bitmap_array",
    "decode_roaring_bitmap_array",
    "encode_roaring64_portable",
    "decode_roaring64_portable",
    "dv_relative_path",
    "load_dv_indices",
    "write_dv_file",
    "inline_dv_descriptor",
]

# ZeroMQ Z85 alphabet (spec 32/Z85) — the encoding the Delta protocol
# uses for DV UUIDs and inline payloads.
_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """4 bytes -> 5 chars, big-endian base 85. Input length must be a
    multiple of 4 (pad before calling; decoders truncate via the
    descriptor's sizeInBytes)."""
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} not a multiple of 4")
    out = []
    for (word,) in struct.iter_unpack(">I", data):
        chunk = []
        for _ in range(5):
            word, rem = divmod(word, 85)
            chunk.append(_Z85_CHARS[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 input length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i : i + 5]:
            try:
                word = word * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        if word > 0xFFFFFFFF:
            raise ValueError(f"Z85 chunk {text[i:i + 5]!r} overflows 32 bits")
        out += struct.pack(">I", word)
    return bytes(out)


# ---------------------------------------------------------------------------
# RoaringBitmapArray (64-bit) portable serialization
# ---------------------------------------------------------------------------

_MAGIC_PORTABLE = 1681511377
# Standard RoaringFormatSpec cookies for the inner 32-bit bitmaps.
_SERIAL_COOKIE = 12347  # run containers possible; count in high 16 bits
_SERIAL_COOKIE_NO_RUNS = 12346  # no run containers; explicit count word
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX_CARD = 4096
_BITSET_BYTES = 1 << 13  # 2^16 bits


def _decode_rb32(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    """One 32-bit RoaringBitmap in RoaringFormatSpec portable layout.
    Returns (sorted uint32 values, next offset)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    if cookie & 0xFFFF == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUNS:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        run_flags = b""
        has_offsets = True
    else:
        raise ValueError(f"unrecognized RoaringBitmap cookie {cookie}")
    desc = np.frombuffer(buf, dtype="<u2", count=2 * n, offset=pos).reshape(
        n, 2
    )
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # container offsets — we read sequentially
    parts: list[np.ndarray] = []
    for i in range(n):
        key = int(desc[i, 0])
        card = int(desc[i, 1]) + 1
        is_run = bool(run_flags) and (run_flags[i // 8] >> (i % 8)) & 1
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(
                buf, dtype="<u2", count=2 * n_runs, offset=pos
            ).reshape(n_runs, 2)
            pos += 4 * n_runs
            if n_runs:
                vals = np.concatenate(
                    [
                        np.arange(s, s + ln + 1, dtype=np.uint32)
                        for s, ln in runs.astype(np.int64)
                    ]
                )
            else:
                vals = np.empty(0, dtype=np.uint32)
        elif card <= _ARRAY_MAX_CARD:
            vals = np.frombuffer(
                buf, dtype="<u2", count=card, offset=pos
            ).astype(np.uint32)
            pos += 2 * card
        else:
            words = np.frombuffer(
                buf, dtype=np.uint8, count=_BITSET_BYTES, offset=pos
            )
            pos += _BITSET_BYTES
            bits = np.unpackbits(words, bitorder="little")
            vals = np.nonzero(bits)[0].astype(np.uint32)
        parts.append(vals + np.uint32(key << 16))
    values = (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint32)
    )
    return values, pos


def decode_roaring_bitmap_array(data: bytes) -> np.ndarray:
    """Serialized RoaringBitmapArray -> sorted int64 row indices."""
    if len(data) < 12:
        raise ValueError("deletion vector payload too short")
    magic, n_bitmaps = struct.unpack_from("<iQ", data, 0)
    if magic != _MAGIC_PORTABLE:
        raise ValueError(
            f"unrecognized RoaringBitmapArray magic {magic} "
            f"(expected portable format {_MAGIC_PORTABLE})"
        )
    pos = 12
    parts: list[np.ndarray] = []
    for hi in range(n_bitmaps):
        vals, pos = _decode_rb32(data, pos)
        parts.append(vals.astype(np.int64) + (hi << 32))
    if not parts:
        return np.empty(0, dtype=np.int64)
    out = np.concatenate(parts)
    out.sort()
    return out


def _encode_rb32(values: np.ndarray) -> bytes:
    """Standard portable no-run-container serialization of one 32-bit
    bitmap (array/bitset containers only — canonical and universally
    readable; runs are an optional optimization)."""
    keys = (values >> 16).astype(np.uint32)
    out_desc = bytearray()
    out_data = bytearray()
    uk, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [len(values)]
    containers: list[bytes] = []
    for i, key in enumerate(uk):
        lows = (values[bounds[i] : bounds[i + 1]] & 0xFFFF).astype("<u2")
        card = len(lows)
        out_desc += struct.pack("<HH", int(key), card - 1)
        if card <= _ARRAY_MAX_CARD:
            containers.append(lows.tobytes())
        else:
            bits = np.zeros(1 << 16, dtype=np.uint8)
            bits[lows] = 1
            containers.append(np.packbits(bits, bitorder="little").tobytes())
    # offsets are mandatory with the no-run cookie
    header = struct.pack("<II", _SERIAL_COOKIE_NO_RUNS, len(uk))
    off = len(header) + len(out_desc) + 4 * len(uk)
    offsets = bytearray()
    for c in containers:
        offsets += struct.pack("<I", off)
        off += len(c)
        out_data += c
    return header + bytes(out_desc) + bytes(offsets) + bytes(out_data)


def encode_roaring_bitmap_array(indices: Iterable[int]) -> bytes:
    """Sorted-or-not iterable of row indices -> portable
    RoaringBitmapArray bytes (round-trips through
    :func:`decode_roaring_bitmap_array`; used by tests and by DV
    file writing)."""
    vals = np.unique(np.asarray(list(indices), dtype=np.int64))
    if len(vals) and (vals[0] < 0):
        raise ValueError("row indices must be non-negative")
    his = (vals >> 32).astype(np.int64)
    out = struct.pack(
        "<iQ", _MAGIC_PORTABLE, int(his[-1]) + 1 if len(vals) else 0
    )
    n_bitmaps = int(his[-1]) + 1 if len(vals) else 0
    for hi in range(n_bitmaps):
        part = vals[his == hi] & 0xFFFFFFFF
        out += _encode_rb32(part.astype(np.uint32))
    return out


def decode_roaring64_portable(data: bytes) -> np.ndarray:
    """STANDARD 64-bit Roaring "portable" serialization (the
    RoaringFormatSpec layout ``Roaring64NavigableMap.serializePortable``
    writes, and what Iceberg v3 Puffin ``deletion-vector-v1`` blobs
    mandate): an 8-byte little-endian count of 32-bit buckets, then
    per bucket an EXPLICIT 4-byte little-endian high key followed by
    the bucket's standard 32-bit roaring serialization. Differs from
    Delta's RoaringBitmapArray (decode_roaring_bitmap_array), whose
    bucket keys are implicit 0..n-1 behind a magic word. Returns
    sorted int64 row positions."""
    if len(data) < 8:
        raise ValueError("roaring64 payload too short")
    (n_keys,) = struct.unpack_from("<Q", data, 0)
    pos = 8
    parts: list[np.ndarray] = []
    for _ in range(n_keys):
        (hi,) = struct.unpack_from("<I", data, pos)
        pos += 4
        vals, pos = _decode_rb32(data, pos)
        parts.append(vals.astype(np.int64) + (int(hi) << 32))
    if not parts:
        return np.empty(0, dtype=np.int64)
    out = np.concatenate(parts)
    out.sort()
    return out


def encode_roaring64_portable(indices: Iterable[int]) -> bytes:
    """Sorted-or-not iterable of row positions -> standard Roaring64
    portable bytes (round-trips through
    :func:`decode_roaring64_portable`); only NON-EMPTY buckets are
    written, each with its explicit high key."""
    vals = np.unique(np.asarray(list(indices), dtype=np.int64))
    if len(vals) and vals[0] < 0:
        raise ValueError("row positions must be non-negative")
    his = (vals >> 32).astype(np.int64)
    uk = np.unique(his)
    out = struct.pack("<Q", len(uk))
    for hi in uk:
        part = (vals[his == hi] & 0xFFFFFFFF).astype(np.uint32)
        out += struct.pack("<I", int(hi)) + _encode_rb32(part)
    return out


# ---------------------------------------------------------------------------
# Descriptor handling (the `deletionVector` struct of an add action)
# ---------------------------------------------------------------------------


def dv_relative_path(path_or_inline: str) -> str:
    """storageType="u": ``pathOrInlineDv`` is an optional random
    prefix followed by a 20-char Z85 UUID; the file lives at
    ``<prefix>/deletion_vector_<uuid>.bin`` under the table root."""
    if len(path_or_inline) < 20:
        raise ValueError(
            f"DV path token {path_or_inline!r} shorter than a Z85 uuid"
        )
    prefix, tail = path_or_inline[:-20], path_or_inline[-20:]
    u = uuid_mod.UUID(bytes=z85_decode(tail))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix}/{name}" if prefix else name


def _read_dv_blob(fpath: str, offset: int, size_in_bytes: int) -> bytes:
    with open(fpath, "rb") as f:
        f.seek(offset)
        (length,) = struct.unpack(">i", f.read(4))
        data = f.read(length)
        (crc,) = struct.unpack(">I", f.read(4))
    if length != size_in_bytes:
        raise ValueError(
            f"DV at {fpath}:{offset} has stored length {length} but the "
            f"descriptor says sizeInBytes={size_in_bytes}"
        )
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError(f"DV at {fpath}:{offset} failed its CRC-32 check")
    return data


def load_dv_indices(descriptor: dict, table_path: str) -> np.ndarray:
    """Descriptor (the add action's ``deletionVector`` dict) ->
    sorted int64 deleted row indices for that file."""
    st = descriptor.get("storageType")
    token = descriptor.get("pathOrInlineDv", "")
    size = int(descriptor.get("sizeInBytes", 0))
    if st == "i":
        data = z85_decode(token)[:size]
        out = decode_roaring_bitmap_array(data)
    elif st in ("u", "p"):
        if st == "u":
            fpath = os.path.join(table_path, dv_relative_path(token))
        else:
            fpath = token[7:] if token.startswith("file://") else token
        # offset points at the 4-byte length word; when absent the DV
        # is the file's single entry right after the 1-byte version
        offset = descriptor.get("offset")
        data = _read_dv_blob(fpath, 1 if offset is None else int(offset), size)
        out = decode_roaring_bitmap_array(data)
    else:
        raise ValueError(f"unknown DV storageType {st!r}")
    card = descriptor.get("cardinality")
    if card is not None and int(card) != len(out):
        raise ValueError(
            f"DV cardinality mismatch: descriptor says {card}, "
            f"bitmap decodes to {len(out)} rows"
        )
    return out


def write_dv_file(
    table_path: str, indices: Iterable[int], prefix: str = ""
) -> dict:
    """Serialize ``indices`` as a DV file under ``table_path`` and
    return the descriptor dict to embed in an add action. Mirrors the
    canonical writer layout: version byte 1, 4-byte BE length,
    payload, 4-byte BE CRC-32."""
    data = encode_roaring_bitmap_array(indices)
    u = uuid_mod.uuid4()
    token = prefix + z85_encode(u.bytes)
    rel = dv_relative_path(token)
    fpath = os.path.join(table_path, rel)
    os.makedirs(os.path.dirname(fpath), exist_ok=True)
    blob = (
        b"\x01"
        + struct.pack(">i", len(data))
        + data
        + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    )
    with open(fpath, "wb") as f:
        f.write(blob)
    n = len(decode_roaring_bitmap_array(data))
    return {
        "storageType": "u",
        "pathOrInlineDv": token,
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": n,
    }


def inline_dv_descriptor(indices: Iterable[int]) -> dict:
    """Inline (storageType="i") descriptor for small DVs — payload
    Z85-encoded in the descriptor itself, zero extra files."""
    data = encode_roaring_bitmap_array(indices)
    size = len(data)
    pad = (-size) % 4
    token = z85_encode(data + b"\x00" * pad)
    n = len(decode_roaring_bitmap_array(data))
    return {
        "storageType": "i",
        "pathOrInlineDv": token,
        "sizeInBytes": size,
        "cardinality": n,
    }
