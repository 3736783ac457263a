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
  parsed with pure stdlib — no PIL needed for dimensions+mime).
  Pixel/sample-level decode is REAL for the formats whose codecs are
  fully public-spec and library-free: PNG (zlib inflate + all five
  scanline filters, decode_png_pixels/encode_png round-trip) and WAV
  PCM16 (RIFF chunk walk, decode_wav/encode_wav) — giving real
  resize (box-filter downsample) and real features (per-channel
  mean/std; RMS/zero-crossings/duration). Only formats that need an
  entropy/DSP codec library (JPEG pixels, video frames) keep the
  deterministic stub (_fake_pixels / byte-window frames, or
  NotImplementedError in strict mode).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

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
    from the payload bytes. Replaces e.g. a CLIP/PIL call. Used when
    the payload is a container we cannot pixel-decode without a codec
    library (JPEG entropy decode, video); PNG and WAV payloads have
    REAL decoders below."""
    if STRICT_DECODE:
        raise NotImplementedError(
            "image/audio codecs are not available in this environment"
        )
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) % 1_000_000_007
    return [((h >> (i * 3)) % 256) / 255.0 for i in range(n)]


# ---------------------------------------------------------------------------
# REAL pixel decode: PNG (zlib + per-scanline unfilter, stdlib only)
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def decode_png_pixels(payload: bytes):
    """Full PNG pixel decode for 8-bit gray/RGB/gray-alpha/RGBA,
    non-interlaced — the spec's DEFLATE stream + five scanline filters
    implemented with zlib and numpy (no PIL). Returns an
    (height, width, channels) uint8 ndarray, or None if the payload
    is not a decodable PNG (palette/16-bit/interlaced fall back to
    the caller's stub path).
    """
    import zlib

    import numpy as np

    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(b):
        length = int.from_bytes(b[pos : pos + 4], "big")
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            bit_depth, color_type = data[8], data[9]
            interlace = data[12]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + CRC
    if (
        not idat
        or width is None
        or bit_depth != 8
        or interlace != 0
        or color_type not in _PNG_CHANNELS
    ):
        return None
    ch = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * ch
    if len(raw) != height * (stride + 1):
        return None
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = arr[:, 0]
    data_rows = arr[:, 1:].astype(np.int16)
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = filters[y]
        row = data_rows[y].copy()
        prior = out[y - 1].astype(np.int16) if y else np.zeros(stride, np.int16)
        if f == 0:  # None
            out[y] = row.astype(np.uint8)
        elif f == 1:  # Sub — sequential in x, vectorize per channel lag
            for x in range(stride):
                left = out[y, x - ch] if x >= ch else 0
                out[y, x] = (row[x] + left) & 0xFF
        elif f == 2:  # Up
            out[y] = ((row + prior) & 0xFF).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - ch]) if x >= ch else 0
                out[y, x] = (row[x] + (left + int(prior[x])) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(out[y, x - ch]) if x >= ch else 0
                bb = int(prior[x])
                c = int(prior[x - ch]) if x >= ch else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                out[y, x] = (row[x] + pred) & 0xFF
        else:
            return None
    return out.reshape(height, width, ch)


def encode_png(pixels: Any, filter_type: int = 0) -> bytes:
    """Minimal PNG writer for 8-bit gray/RGB/RGBA ndarrays (one
    filter type for all scanlines — the decoder handles all five, so
    tests parametrize over them). Real zlib stream, real CRCs: any
    standard viewer opens the output."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    height, width, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = px.reshape(height, width * ch).astype(np.int16)
    stride = width * ch
    lines = bytearray()
    recon = np.zeros((height, stride), dtype=np.int16)
    for y in range(height):
        recon[y] = flat[y]
        prior = recon[y - 1] if y else np.zeros(stride, np.int16)
        if filter_type == 0:
            filt = flat[y]
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int16), flat[y][:-ch]])
            filt = (flat[y] - left) % 256
        elif filter_type == 2:
            filt = (flat[y] - prior) % 256
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int16), flat[y][:-ch]])
            filt = (flat[y] - (left + prior) // 2) % 256
        elif filter_type == 4:
            filt = np.zeros(stride, np.int16)
            for x in range(stride):
                a = int(flat[y][x - ch]) if x >= ch else 0
                bb = int(prior[x])
                c = int(prior[x - ch]) if x >= ch else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                filt[x] = (int(flat[y][x]) - pred) % 256
        else:
            raise ValueError(f"filter_type {filter_type}")
        lines.append(filter_type)
        lines.extend(filt.astype(np.uint8).tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 9))
        + chunk(b"IEND", b"")
    )


def resize_block_mean(pixels: Any, out_h: int, out_w: int) -> Any:
    """Box-filter downsample of an (H, W, C) uint8 array to
    (out_h, out_w, C) — the "resize" stage of the pipeline, pure
    numpy. Uses integral-image block averaging so any output size
    works (not just divisors)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.float64)
    h, w, c = px.shape
    ys = (np.linspace(0, h, out_h + 1)).astype(int)
    xs = (np.linspace(0, w, out_w + 1)).astype(int)
    out = np.zeros((out_h, out_w, c), dtype=np.uint8)
    for i in range(out_h):
        for j in range(out_w):
            block = px[ys[i] : max(ys[i + 1], ys[i] + 1),
                       xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i, j] = block.mean(axis=(0, 1)).round()
    return out


def image_pixel_features(pixels: Any) -> list[float]:
    """REAL feature vector from decoded pixels: per-channel mean and
    std over [0,1], padded/truncated to 8 floats (schema-stable with
    the _fake_pixels stub path)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.float64) / 255.0
    means = px.mean(axis=(0, 1))
    stds = px.std(axis=(0, 1))
    feats = [float(v) for pair in zip(means, stds) for v in pair]
    return (feats + [0.0] * 8)[:8]


# ---------------------------------------------------------------------------
# REAL audio decode: WAV / PCM16 (RIFF parse, stdlib + numpy)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM16 decode: returns (sample_rate, channels,
    samples) with samples an (n_frames, channels) int16 ndarray, or
    None if the payload is not PCM16 WAV. Real container parse —
    walks the chunk list to fmt / data like any audio loader."""
    import numpy as np

    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    rate = channels = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                return None
            fmt_tag = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bps = int.from_bytes(body[14:16], "little")
            if fmt_tag != 1 or bps != 16:  # PCM16 only
                return None
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or channels in (None, 0) or data is None:
        return None
    n = len(data) // (2 * channels)
    samples = (
        np.frombuffer(data[: n * 2 * channels], dtype="<i2")
        .reshape(n, channels)
        .copy()
    )
    return rate, channels, samples


def encode_wav(samples: Any, sample_rate: int = 16000) -> bytes:
    """Minimal PCM16 WAV writer (n_frames, channels) — test fixture
    generator; output opens in any audio tool."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode + features over Arrow-batched mapInPandas:
    PCM16 WAV payloads → sample rate, frame count, duration, RMS
    amplitude, zero-crossing count (channel 0). Non-WAV payloads get
    NULL features. Same batch shape / schema-stability contract as
    decode_image_features."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "sample_rate", "channels", "n_frames",
                "duration_ms", "rms", "zero_crossings",
            )}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                decoded = decode_wav(payload)
                if decoded is None:
                    for k in (
                        "sample_rate", "channels", "n_frames",
                        "duration_ms", "rms", "zero_crossings",
                    ):
                        rows[k].append(None)
                    continue
                rate, channels, samples = decoded
                mono = samples[:, 0].astype(np.float64)
                n = len(mono)
                rows["sample_rate"].append(rate)
                rows["channels"].append(channels)
                rows["n_frames"].append(n)
                rows["duration_ms"].append(n / rate * 1000.0)
                rows["rms"].append(
                    float(np.sqrt(np.mean(mono**2))) if n else 0.0
                )
                rows["zero_crossings"].append(
                    int(np.sum(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if n > 1
                    else 0
                )
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "sample_rate": pd.array(rows["sample_rate"], dtype="Int32"),
                    "channels": pd.array(rows["channels"], dtype="Int32"),
                    "n_frames": pd.array(rows["n_frames"], dtype="Int64"),
                    "duration_ms": rows["duration_ms"],
                    "rms": rows["rms"],
                    "zero_crossings": pd.array(
                        rows["zero_crossings"], dtype="Int64"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, AUDIO_FEATURES_SCHEMA
    )


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
    REAL header parse (parse_image_dims). Decodable PNGs (8-bit,
    non-interlaced) get REAL pixel features (decode_png_pixels →
    per-channel mean/std); containers needing a codec library (JPEG
    entropy decode, palette PNG, ...) fall back to the deterministic
    stub (_fake_pixels).
    """
    id_name, payload_name = id_col, payload_col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths: list[int | None] = []
            heights: list[int | None] = []
            mimes: list[str | None] = []
            feats: list[list[float]] = []
            for b in pdf[payload_name]:
                dims = parse_image_dims(b)
                widths.append(dims[0] if dims else None)
                heights.append(dims[1] if dims else None)
                mimes.append(dims[2] if dims else None)
                px = decode_png_pixels(b) if dims else None
                feats.append(
                    image_pixel_features(px)
                    if px is not None
                    else _fake_pixels(b)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name],
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "mime": mimes,
                    "features": feats,
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


FRAME_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mime", T.StringType()),
    ]
)


def frame_sample_decoded(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 2,
) -> DataFrame:
    """Container-aware frame sampling with REAL per-frame header
    decode: the payload is a concatenation of image frames (the
    MJPEG idea — a 'video' that is just stacked still frames, a
    public format family); the kernel SPLITS the byte stream on the
    PNG signature, runs the real IHDR parse (parse_image_dims) on
    every retained frame, and emits one row per sampled frame — the
    fan-out mapInPandas shape of an ffmpeg frame sampler, with the
    codec step being an actual public-spec header decode instead of
    a byte-window stub. Arrow-batched; output rows ≠ input rows.
    """
    sig = b"\x89PNG\r\n\x1a\n"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, mimes = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                # frame boundaries = PNG signature offsets
                offs = []
                pos = raw.find(sig)
                while pos != -1:
                    offs.append(pos)
                    pos = raw.find(sig, pos + 1)
                for fi, start in enumerate(offs):
                    if fi % every_n:
                        continue
                    end = offs[fi + 1] if fi + 1 < len(offs) else len(raw)
                    parsed = parse_image_dims(raw[start:end])
                    if parsed is None:
                        continue
                    w, h, mime = parsed
                    ids.append(doc_id)
                    idxs.append(fi)
                    ws.append(w)
                    hs.append(h)
                    mimes.append(mime)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "width": ws,
                    "height": hs,
                    "mime": mimes,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, FRAME_DECODE_SCHEMA
    )
