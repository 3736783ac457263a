"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB:
- payloads are ``binary`` columns co-located with typed metadata
  structs (modality, mime, width/height/duration, sha256) so planning
  predicates (e.g. "images wider than 512px") prune WITHOUT touching
  bytes — column pruning keeps the binary column unread until a
  decode stage actually needs it;
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages: Arrow-batched, schema-stable, one Python
  worker pipeline per partition. The actual codec calls need
  libraries this container doesn't ship, so the codec kernel is
  STUBBED (deterministic fake derived from the payload hash, or
  NotImplementedError in strict mode) — the Spark-side contract
  (schemas, batching, partitioning) is real and tested.
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
    composes with joins/aggs downstream. The pixel decode itself is a
    stub (see _fake_pixels).
    """
    id_name, payload_name = id_col, payload_col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_name]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name],
                    # real impl: PIL.Image.open(io.BytesIO(b)).size
                    "width": [((len(b) * 7) % 1024) + 1 for b in payloads],
                    "height": [((len(b) * 13) % 1024) + 1 for b in payloads],
                    "features": [_fake_pixels(b) for b in payloads],
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
