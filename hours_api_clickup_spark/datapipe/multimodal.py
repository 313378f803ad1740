"""Multimodal column plumbing: opaque binary media + typed metadata.

Design for 100 TB: media lives as a ``binary`` column (or object-store
URIs) beside a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the Python
boundary is crossed once per batch, not per row, and each partition
streams through the decoder without materializing the whole table.

Codecs: ``decode_media`` is a REAL pure-Python/numpy decoder for the
two uncompressed formats that need no external library — 24-bit BI_RGB
BMP and binary P6 PPM — with matching encoders so the decode path is
exercised end-to-end on real pixel data (query ``multimodal_decode``:
encode → opaque binary column → decode → width/height/mean-luma,
oracle-checked). Compressed formats (PNG/JPEG/WAV/MP4) raise
ValueError: they require codec libraries absent from this container;
production wiring is try-import PIL / soundfile / av inside the same
mapInPandas worker. ``extract_features`` keeps the deterministic
sha256-seeded feature path (stable across engines for its oracle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("content", StringType()),  # binary handled below
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha256", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Build an opaque-binary media table from any string column: content
    becomes bytes with a fake format header; metadata is typed columns.
    Stands in for reading real image/audio bytes from object storage."""
    payload = F.col(payload_col)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.concat(F.lit("IMG0"), payload).cast("binary").alias("content"),
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        (F.length(payload) % 1024 + 16).cast("long").alias("width"),
        (F.length(payload) % 768 + 16).cast("long").alias("height"),
    )


# ---------------------------------------------------------------------------
# Real codecs: 24-bit BI_RGB BMP + binary P6 PPM, pure Python/numpy.
# ---------------------------------------------------------------------------


def encode_bmp(pixels) -> bytes:
    """HxWx3 uint8 RGB → 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, BGR byte order, rows padded to 4 bytes)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += px[y, :, ::-1].tobytes()  # RGB → BGR
        body += b"\x00" * pad
    pixel_off = 14 + 40
    file_size = pixel_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + bytes(body)


def decode_bmp(data: bytes):
    """24-bit BI_RGB BMP bytes → HxWx3 uint8 RGB array."""
    import struct

    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} comp={comp}")
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    rows = []
    for y in range(abs(h)):
        off = pixel_off + y * stride
        row = np.frombuffer(data, np.uint8, row_bytes, off).reshape(w, 3)
        rows.append(row[:, ::-1])  # BGR → RGB
    px = np.stack(rows)
    return px[::-1] if h > 0 else px  # bottom-up → top-down


def encode_ppm(pixels) -> bytes:
    """HxWx3 uint8 RGB → binary PPM (P6, maxval 255, row-major)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_ppm(data: bytes):
    """Binary P6 PPM bytes → HxWx3 uint8 RGB array."""
    import numpy as np

    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM stream")
    # header = three whitespace-separated tokens after the magic
    # (width, height, maxval), then ONE whitespace byte, then pixels
    tokens, i = [], 2
    while len(tokens) < 3:
        while data[i : i + 1].isspace():
            i += 1
        j = i
        while not data[j : j + 1].isspace():
            j += 1
        tokens.append(int(data[i:j]))
        i = j
    i += 1  # the single separator byte
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval: {maxval}")
    return np.frombuffer(data, np.uint8, w * h * 3, i).reshape(h, w, 3)


def decode_media(content: bytes, media_type: str | None = None):
    """Decode an opaque media payload to an HxWx3 uint8 RGB array.

    Sniffs the magic bytes — ``BM`` → BMP, ``P6`` → PPM — the two
    uncompressed formats decodable without external libraries.
    Compressed formats raise ValueError with the dependency named;
    production adds try-import PIL/soundfile/av branches here, inside
    the same per-batch worker.
    """
    raw = bytes(content)
    if raw[:2] == b"BM":
        return decode_bmp(raw)
    if raw[:2] == b"P6":
        return decode_ppm(raw)
    raise ValueError(
        f"no built-in codec for media_type={media_type!r} "
        f"(magic={raw[:4]!r}); PNG/JPEG/WAV/MP4 need PIL/soundfile/av"
    )


def _fake_features(content: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: 8 doubles
    derived from the sha256 digest, stable across runs and engines."""
    digest = hashlib.sha256(content).digest()
    return [
        int.from_bytes(digest[i * 4 : i * 4 + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: one Python crossing per Arrow batch; partitions stream.
    Swap ``_fake_features`` for a real decoder without touching the plan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(len).astype("int64"),
                    "content_sha256": content.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "features": content.map(lambda b: _fake_features(bytes(b))),
                }
            )

    from hours_api_clickup_spark.datapipe.dedup import spread

    # decode work is per-row CPU in Python workers — fan out the scan so
    # every core runs a worker instead of one giant batch stream
    return spread(media).mapInPandas(run, schema=FEATURES_SCHEMA)


CODED_MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("fmt", StringType()),
        StructField("content", BinaryType()),
    ]
)

DECODE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("fmt", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def _gradient_pixels(media_id: int):
    """Deterministic test image: w/h/base-gray derive from the id, each
    pixel value is (g + 3x + 7y) % 256 on all three channels — simple
    enough for a SQL oracle to replay, non-constant enough that a
    decoder bug (row order, padding, channel swap) changes the stats."""
    import numpy as np

    w = media_id % 13 + 4
    h = media_id % 7 + 3
    g = media_id % 251
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    v = ((g + 3 * x[None, :] + 7 * y[:, None]) % 256).astype(np.uint8)
    return np.repeat(v[:, :, None], 3, axis=2)


def synthesize_coded_media(df: DataFrame, id_col: str) -> DataFrame:
    """Encode a real BMP (even ids) or PPM (odd ids) gradient image per
    row — the binary column downstream stages must treat as opaque."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "fmt": ids.map(lambda i: "bmp" if i % 2 == 0 else "ppm"),
                    "content": ids.map(
                        lambda i: (
                            encode_bmp(_gradient_pixels(int(i)))
                            if i % 2 == 0
                            else encode_ppm(_gradient_pixels(int(i)))
                        )
                    ),
                }
            )

    from hours_api_clickup_spark.datapipe.dedup import spread

    return spread(df.select(id_col)).mapInPandas(
        run, schema=CODED_MEDIA_SCHEMA
    )


def decode_stats(media: DataFrame) -> DataFrame:
    """REAL decode stage: sniff + parse each binary payload
    (decode_media) and emit decoded dimensions and mean luminance.
    Arrow-batched mapInPandas — one Python crossing per batch; the
    schema/partitioning contract is identical to what a PIL/av-backed
    decoder would use, so swapping codecs never touches the plan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:  # avoid all-NA-dtype frames in the Arrow concat
                continue
            out = {
                "media_id": [],
                "fmt": [],
                "width": [],
                "height": [],
                "n_pixels": [],
                "mean_luma": [],
            }
            for mid, fmt, raw in zip(
                pdf["media_id"], pdf["fmt"], pdf["content"]
            ):
                px = decode_media(raw, fmt)
                h, w, _ = px.shape
                out["media_id"].append(mid)
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                # channels are equal, so mean over all values IS the
                # luma; int sums are exact in float64 → engine-portable
                out["mean_luma"].append(float(px.astype("float64").mean()))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=DECODE_STATS_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_media(
    media: DataFrame, target_width: int = 224, target_height: int = 224
) -> DataFrame:
    """Resize stage: binary in → binary out, so stages compose into a
    decode→resize→featurize pipeline without schema breaks.

    The pixel resample is the stubbed codec step (``decode_media``); the
    deterministic fake scales the byte payload to a length proportional
    to the target area — preserving the real contract: output rows keep
    (media_id, media_type), carry new typed dimensions, and the content
    column stays opaque binary. Arrow-batched mapInPandas, one Python
    crossing per batch; image-only rows pass through the resampler,
    audio/video pass through untouched (their "resize" is
    ``frame_sample_plan`` / re-chunking).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        area = target_width * target_height
        for pdf in batches:
            is_img = pdf["media_type"].eq("image/png")
            src_area = (pdf["width"] * pdf["height"]).clip(lower=1)
            scale = (area / src_area) ** 0.5

            def _rescale(b, s):
                # fake resample: repeat/truncate bytes to the scaled size
                raw = bytes(b)
                n = max(4, int(len(raw) * s))
                return (raw * (n // max(len(raw), 1) + 1))[:n]

            content = [
                _rescale(b, s) if img else bytes(b)
                for b, s, img in zip(pdf["content"], scale, is_img)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": content,
                    "width": pdf["width"].where(~is_img, target_width).astype("int64"),
                    "height": pdf["height"].where(~is_img, target_height).astype("int64"),
                }
            )

    from hours_api_clickup_spark.datapipe.dedup import spread

    return spread(media).mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: fan out one row per sampled frame
    index (the decode of each frame is the stubbed codec step). Shows the
    explode-then-decode shape used for video at scale."""
    n_frames = (F.length(F.col("content")) % 100 + 1).alias("n_frames")
    return (
        media.filter(F.col("media_type") == "video/mp4")
        .select("media_id", "content", n_frames)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
