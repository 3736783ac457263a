"""Iceberg v3 deletion vectors — Puffin codec, pure Python + numpy.

Implements the PUBLIC Apache Iceberg Puffin file format
(iceberg.apache.org/puffin-spec) and the v3 table spec's
deletion-vector surface (iceberg.apache.org/spec, "Deletion
vectors"): v3 replaces position-delete FILES with per-data-file
deletion vectors — roaring bitmaps of deleted row positions — stored
as ``deletion-vector-v1`` blobs inside Puffin files. The reference
has no Iceberg v3 path at all (it reads Delta through delta-rs,
reference ``uchelper/dataframe.py:198-199``); this module extends the
pure-Python Iceberg reader/writer (``iceberg_py.py`` /
``pyiceberg_source.py``) forward to v3 reads plus a minimal v3 DV
writer for staging and DELETE.

On-disk formats implemented here:

- **Puffin file**: ``PFA1`` magic, concatenated blobs, then a footer
  of ``PFA1`` + UTF-8 JSON FileMetadata + 4-byte LE payload size +
  4-byte flags (0 = uncompressed) + ``PFA1``.
- **deletion-vector-v1 blob**: a 4-byte big-endian length of
  (magic + vector), the 4-byte magic ``D1 D3 39 64`` (the same bytes
  as Delta's RoaringBitmapArray magic 1681511377 — the formats were
  aligned on purpose), the vector in the STANDARD 64-bit roaring
  "portable" serialization (explicit per-bucket high keys —
  delta_dv.encode_roaring64_portable), and a 4-byte big-endian
  CRC-32 of (magic + vector).
- **v3 manifest entry fields** for DVs (written by iceberg_py's
  manifest writer): ``referenced_data_file`` (field 143),
  ``content_offset`` (144), ``content_size_in_bytes`` (145) on
  content=1 entries with ``file_format="PUFFIN"``.

Scale: blob decode is O(serialized bytes) numpy work; callers decide
WHERE it runs — read_iceberg decodes driver-side only under the
broadcast cardinality cap and ships (path, offset, length) rows for
executor-side decode above it (the delta_py DV pattern), and the
pyiceberg source decodes per referenced file inside its executor
task. DV BUILD on delete runs in executors via applyInPandas (one
group per touched file, one single-blob Puffin per file — Iceberg
allows any blob-to-file packing); only descriptor-sized rows reach
the driver.
"""
from __future__ import annotations

import json
import os
import struct
import zlib

from typing import Iterable

import numpy as np

from .delta_dv import (
    decode_roaring64_portable,
    encode_roaring64_portable,
)

__all__ = [
    "PUFFIN_MAGIC",
    "dv_blob_bytes",
    "parse_dv_blob",
    "read_dv_blob",
    "write_puffin_dv_file",
    "read_puffin_footer",
]

PUFFIN_MAGIC = b"PFA1"
# 1681511377 little-endian = D1 D3 39 64 — shared with Delta's
# RoaringBitmapArray magic (the two specs aligned the DV payload
# framing deliberately).
_DV_MAGIC = struct.pack("<i", 1681511377)


def dv_blob_bytes(indices: "Iterable[int]") -> tuple[bytes, int]:
    """Deleted row positions -> (serialized deletion-vector-v1 blob,
    cardinality). Layout per the Puffin spec: BE length of
    magic+vector, magic, standard portable roaring64 vector, BE
    CRC-32 of magic+vector."""
    vec = encode_roaring64_portable(indices)
    body = _DV_MAGIC + vec
    blob = (
        struct.pack(">i", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )
    card = len(decode_roaring64_portable(vec))
    return blob, card


def parse_dv_blob(data: bytes) -> np.ndarray:
    """A deletion-vector-v1 blob (length-prefixed, CRC-suffixed) ->
    sorted int64 deleted positions; refuses on any framing, magic, or
    checksum mismatch."""
    if len(data) < 12:
        raise ValueError("deletion-vector blob too short")
    (length,) = struct.unpack_from(">i", data, 0)
    if length + 8 != len(data):
        raise ValueError(
            f"deletion-vector blob framing mismatch: prefix says "
            f"{length} bytes of magic+vector, blob holds {len(data) - 8}"
        )
    body = data[4 : 4 + length]
    (crc,) = struct.unpack_from(">I", data, 4 + length)
    if zlib.crc32(body) & 0xFFFFFFFF != crc:
        raise ValueError("deletion-vector blob failed its CRC-32 check")
    if body[:4] != _DV_MAGIC:
        raise ValueError(
            f"deletion-vector blob magic {body[:4]!r} != {_DV_MAGIC!r}"
        )
    return decode_roaring64_portable(body[4:])


def read_dv_blob(fpath: str, offset: int, length: int) -> np.ndarray:
    """The manifest entry's (content_offset, content_size_in_bytes)
    window of a Puffin file -> sorted int64 deleted positions."""
    with open(fpath, "rb") as f:
        f.seek(int(offset))
        data = f.read(int(length))
    if len(data) != int(length):
        raise ValueError(
            f"short read of DV blob at {fpath}:{offset} "
            f"({len(data)} of {length} bytes)"
        )
    return parse_dv_blob(data)


def write_puffin_dv_file(
    fpath: str,
    dvs: list,
    snapshot_id: int,
    sequence_number: int,
) -> list:
    """Write ONE Puffin file holding a deletion-vector-v1 blob per
    ``(referenced_data_file, indices)`` pair in ``dvs``; returns one
    descriptor dict per blob: ``{referenced, offset, length,
    cardinality, path, file_size}`` — what a v3 manifest entry
    needs. The footer's FileMetadata carries the spec's standard
    blob properties (``referenced-data-file``, ``cardinality``)."""
    os.makedirs(os.path.dirname(fpath), exist_ok=True)
    blob_meta = []
    out = []
    payload = bytearray(PUFFIN_MAGIC)
    for referenced, indices in dvs:
        blob, card = dv_blob_bytes(indices)
        offset = len(payload)
        payload += blob
        blob_meta.append(
            {
                "type": "deletion-vector-v1",
                "fields": [],
                "snapshot-id": int(snapshot_id),
                "sequence-number": int(sequence_number),
                "offset": offset,
                "length": len(blob),
                "properties": {
                    "referenced-data-file": str(referenced),
                    "cardinality": str(card),
                },
            }
        )
        out.append(
            {
                "referenced": str(referenced),
                "offset": offset,
                "length": len(blob),
                "cardinality": card,
            }
        )
    footer_json = json.dumps(
        {"blobs": blob_meta, "properties": {}}
    ).encode()
    payload += PUFFIN_MAGIC
    payload += footer_json
    payload += struct.pack("<i", len(footer_json))
    payload += struct.pack("<i", 0)  # flags: uncompressed footer
    payload += PUFFIN_MAGIC
    with open(fpath, "wb") as f:
        f.write(bytes(payload))
    size = os.path.getsize(fpath)
    for d in out:
        d["path"] = fpath
        d["file_size"] = size
    return out


def read_puffin_footer(fpath: str) -> dict:
    """Parse a Puffin file's footer FileMetadata (used by tests and
    foreign-file inspection; the read path goes straight to the blob
    via the manifest's content_offset/content_size_in_bytes)."""
    size = os.path.getsize(fpath)
    with open(fpath, "rb") as f:
        head = f.read(4)
        if head != PUFFIN_MAGIC:
            raise ValueError(f"{fpath} is not a Puffin file")
        f.seek(size - 12)
        tail = f.read(12)
        payload_size, flags = struct.unpack("<ii", tail[:8])
        if tail[8:] != PUFFIN_MAGIC:
            raise ValueError(f"{fpath}: trailing Puffin magic missing")
        if flags & 1:
            raise ValueError(
                f"{fpath}: compressed Puffin footer unsupported"
            )
        f.seek(size - 12 - payload_size)
        payload = f.read(payload_size)
        f.seek(size - 12 - payload_size - 4)
        if f.read(4) != PUFFIN_MAGIC:
            raise ValueError(
                f"{fpath}: footer-start Puffin magic missing"
            )
    return json.loads(payload.decode())
