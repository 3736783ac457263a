"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB:
- payloads are ``binary`` columns co-located with typed metadata
  structs (modality, mime, width/height/duration, sha256) so planning
  predicates (e.g. "images wider than 512px") prune WITHOUT touching
  bytes — column pruning keeps the binary column unread until a
  decode stage actually needs it;
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages: Arrow-batched, schema-stable, one Python
  worker pipeline per partition. Container/header-level decode is
  REAL (PNG IHDR / GIF screen descriptor / JPEG SOFn / BMP header
  parsed with pure stdlib — no PIL needed for dimensions+mime); only
  the pixel-level feature extraction is stubbed (deterministic fake
  derived from the payload hash, or NotImplementedError in strict
  mode), because no pixel codec ships in this container.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STRICT_DECODE = False  # True → stubs raise instead of faking

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def attach_media_metadata(
    df: DataFrame, payload_col: str, modality: str, mime: str
) -> DataFrame:
    """Add the typed ``media`` metadata struct next to a binary column.
    Width/height/duration are unknown until decode → NULL; sha256 is
    computed JVM-side (no Python).
    """
    return df.withColumn(
        "media",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.sha2(F.col(payload_col), 256).alias("sha256"),
        ),
    )


def parse_image_dims(payload: bytes) -> tuple[int, int, str] | None:
    """Real container-header decode, stdlib only: returns
    (width, height, mime) for PNG / GIF / JPEG / BMP payloads, None if
    the bytes are not a recognized image container.

    This is the part of "image decode" that needs no codec library —
    dimensions live in fixed header fields — and it is what planning
    predicates ("images wider than 512px") need. Pixel decode stays
    stubbed (_fake_pixels).
    """
    b = bytes(payload)
    # PNG: 8-byte signature, then IHDR chunk (len + type + w + h, BE).
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        return (
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
            "image/png",
        )
    # GIF87a/89a: logical screen descriptor, LE uint16 at offsets 6/8.
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
            "image/gif",
        )
    # BMP: "BM", DIB header width/height as LE int32 at 18/22.
    if b[:2] == b"BM" and len(b) >= 26:
        return (
            int.from_bytes(b[18:22], "little", signed=True),
            abs(int.from_bytes(b[22:26], "little", signed=True)),
            "image/bmp",
        )
    # JPEG: walk marker segments to the first SOFn frame header.
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers, no length field
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            # SOF0-SOF15 except DHT(C4)/JPG(C8)/DAC(CC): frame header
            # holds precision(1), height(2), width(2).
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= len(b):
                    return (
                        int.from_bytes(b[i + 7 : i + 9], "big"),
                        int.from_bytes(b[i + 5 : i + 7], "big"),
                        "image/jpeg",
                    )
                return None
            i += 2 + seg_len
    return None


def _fake_pixels(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for decoded features: n floats derived
    from the payload bytes. Replaces e.g. a CLIP/PIL call."""
    if STRICT_DECODE:
        raise NotImplementedError(
            "image/audio codecs are not available in this environment"
        )
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) % 1_000_000_007
    return [((h >> (i * 3)) % 256) / 255.0 for i in range(n)]


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mime", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_image_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched decode + feature-extract over ``mapInPandas``.

    Batch shape: the kernel sees pandas DataFrames of
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows (default
    10k); output schema is fixed (IMAGE_FEATURES_SCHEMA) so the stage
    composes with joins/aggs downstream. Width/height/mime come from a
    REAL header parse (parse_image_dims); rows whose payload is not a
    recognized image container get NULL dims. Only the pixel-level
    feature vector is stubbed (_fake_pixels).
    """
    id_name, payload_name = id_col, payload_col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths: list[int | None] = []
            heights: list[int | None] = []
            mimes: list[str | None] = []
            for b in pdf[payload_name]:
                dims = parse_image_dims(b)
                widths.append(dims[0] if dims else None)
                heights.append(dims[1] if dims else None)
                mimes.append(dims[2] if dims else None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name],
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "mime": mimes,
                    "features": [_fake_pixels(b) for b in pdf[payload_name]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, IMAGE_FEATURES_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 10,
) -> DataFrame:
    """Sample every Nth 'frame' of a video payload → one row per frame
    (fan-out mapInPandas: output rows ≠ input rows, the shape a real
    ffmpeg frame sampler has). Frame extraction is stubbed as fixed-
    size byte windows.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out_ids, out_idx, out_sha = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if STRICT_DECODE:
                    raise NotImplementedError("video codecs unavailable")
                n_frames = max(1, len(payload) // 32)
                for fi in range(0, n_frames, every_n):
                    chunk = bytes(payload[fi * 32 : (fi + 1) * 32])
                    out_ids.append(doc_id)
                    out_idx.append(fi)
                    out_sha.append(hashlib.sha256(chunk).hexdigest()[:16])
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame_sha": out_sha}
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)
