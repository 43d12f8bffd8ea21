"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + a typed metadata struct;
decode / feature-extraction run as Arrow-batched ``mapInPandas`` stages.
Uncompressed image formats (PPM P6, 24-bit BMP) decode FOR REAL with
numpy alone; codec formats (JPEG/PNG/audio/video) would need PIL/opencv,
absent in this container, and fall through to a deterministic
byte-histogram — the Spark-side contract (schema, batch shape,
partitioning) is identical either way and fully tested.

Scale notes: media rows are large; ``mapInPandas`` streams Arrow batches,
so executor memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
(lower it for video). Partition by content size, not row count, before the
decode stage; never collect binaries to the driver.
"""

from __future__ import annotations

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
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("meta", StringType()),  # JSON side-channel metadata
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a media table from a text table (test harness: payload =
    utf-8 bytes). In production the payload column comes straight from
    ``spark.read.format('binaryFile')`` or parquet binary columns."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
        F.to_json(F.struct(F.col(id_col).alias("src_id"))).alias("meta"),
    )


def _parse_ppm(b: bytes):
    """Binary PPM (P6) → HxWx3 uint8 array — numpy-only real decode."""
    import numpy as np

    if not b.startswith(b"P6"):
        return None
    # header tokens: magic, width, height, maxval; '#' comments to EOL
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(b):
        c = b[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            pos = b.index(b"\n", pos) + 1
        else:
            end = pos
            while end < len(b) and not b[end : end + 1].isspace():
                end += 1
            tokens.append(int(b[pos:end]))
            pos = end
    w, h, maxval = tokens
    if maxval > 255:
        return None  # 16-bit channels: out of scope
    pos += 1  # single whitespace after maxval
    pix = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=pos)
    return pix.reshape(h, w, 3)


def _parse_bmp(b: bytes):
    """Uncompressed 24-bit bottom-up BMP → HxWx3 uint8 (RGB) array."""
    import numpy as np

    if not b.startswith(b"BM") or len(b) < 54:
        return None
    offset = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = abs(h)
    raw = np.frombuffer(b, dtype=np.uint8, count=stride * rows, offset=offset)
    img = raw.reshape(rows, stride)[:, : w * 3].reshape(rows, w, 3)
    if h > 0:
        img = img[::-1]  # bottom-up storage
    return img[..., ::-1]  # BGR -> RGB


def _image_features(img) -> list[float]:
    """[width, height, mean_r, mean_g, mean_b] + 8-bucket luminance
    histogram (L1-normalized) — a deterministic 13-float descriptor."""
    import numpy as np

    h, w, _ = img.shape
    means = img.reshape(-1, 3).mean(axis=0)
    lum = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).astype(np.uint8)
    counts = np.bincount(lum.reshape(-1) >> 5, minlength=8).astype(float)
    hist = counts / max(counts.sum(), 1.0)
    return [float(w), float(h), *[float(m) for m in means], *hist.tolist()]


def _decode_image_batch(payload: pd.Series) -> pd.Series:
    """Decode a batch of image payloads → feature vectors.

    REAL decode for uncompressed formats parseable with numpy alone (PPM
    P6, 24-bit BMP) → 13-float descriptor (dims + channel means +
    luminance histogram). Codec formats (JPEG/PNG/...) need PIL/opencv,
    absent in this container — those payloads fall through to a
    deterministic byte-histogram (8 floats), keeping the pipeline
    end-to-end testable with real Arrow batch boundaries.
    """

    def decode(b: bytes) -> list[float]:
        b = bytes(b)
        img = _parse_ppm(b)
        if img is None:
            img = _parse_bmp(b)
        if img is not None:
            return _image_features(img)
        counts = [0] * 8
        for byte in b[:4096]:  # cap per-item work; deterministic
            counts[byte >> 5] += 1
        total = max(sum(counts), 1)
        return [c / total for c in counts]

    return payload.map(decode)


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    ``mapInPandas`` (not a scalar UDF) so one Python call handles a whole
    Arrow batch and can drop/expand rows; the 10-100× batch advantage over
    row-at-a-time UDFs is the point (SURVEY.md §2.10).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": _decode_image_batch(pdf["payload"]),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: expand each payload into sampled
    "frame" rows (stub: fixed-stride byte windows standing in for frames).
    Demonstrates the row-expanding mapInPandas contract used for video."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_no", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(payload), every_n * 16)):
                    ids.append(mid)
                    nos.append(i)
                    frames.append(bytes(payload[off : off + 16]))
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return media.mapInPandas(run, schema=schema)
