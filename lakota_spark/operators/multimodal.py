"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + a typed metadata struct;
decode / feature-extraction run as Arrow-batched ``mapInPandas`` stages.
The actual codec calls are STUBBED (image/audio libraries are not in this
container — see the guard in ``_decode_image_batch``): the Spark-side
contract — schema, batch shape, partitioning — is real and tested with a
deterministic fake decoder.

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


def _decode_image_batch(payload: pd.Series) -> pd.Series:
    """Decode a batch of image payloads → fixed-size feature vectors.

    STUB: real decoding needs PIL/opencv which are absent here. The
    deterministic fake (byte-histogram over 8 buckets, L1-normalized) keeps
    the pipeline end-to-end testable with a real Arrow batch boundary.
    """
    try:  # pragma: no cover - the real path, absent in this container
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode wired but untested in this environment"
        )
    except ImportError:
        pass

    def histo(b: bytes) -> list[float]:
        counts = [0] * 8
        for byte in b[:4096]:  # cap per-item work; deterministic
            counts[byte >> 5] += 1
        total = max(sum(counts), 1)
        return [c / total for c in counts]

    return payload.map(histo)


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
