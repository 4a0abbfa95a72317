"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque ``binary`` columns with a typed metadata struct —
the lakehouse pattern for multimodal training data: bytes travel in
parquet next to their metadata, decode happens lazily in Arrow-batched
Python UDFs on the executors.

The Spark-side machinery here is REAL and tested: schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partition sizing. The codec step
itself is STUBBED (``_decode_image_stub``) because image/audio
libraries are not in this container — swap the stub for PIL/ffmpeg
calls and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("format", StringType(), True),       # png|jpeg|wav|...
        StructField("payload", BinaryType(), True),
        StructField("payload_bytes", LongType(), True),
        StructField("source_uri", StringType(), True),
    ]
)

DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_luma", IntegerType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a deterministic media table from a text corpus: payload =
    utf-8 bytes of the text (stands in for encoded image bytes). Lets
    the full binary-column pipeline run — storage, batching, decode —
    with reproducible content."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias(
            "payload_bytes"
        ),
        F.concat(F.lit("synthetic://doc/"), F.col(id_col)).alias("source_uri"),
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder — deterministic pseudo-decode of (width, height,
    mean_luma) from the byte stream. Replace with::

        from PIL import Image; img = Image.open(io.BytesIO(payload))

    when codec libraries are available. Raising NotImplementedError
    here would be the other documented option; the deterministic fake
    keeps the downstream pipeline testable.
    """
    if payload is None:
        return (0, 0, 0)
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    width = 64 + (checksum % 192)
    height = 64 + (n % 192)
    mean_luma = (checksum + n) % 256
    return (width, height, mean_luma)


def decode_images(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode image payloads → (media_id, width, height, mean_luma).

    ``mapInPandas``: payload bytes arrive in Arrow record batches, the
    decoder runs vectorized per batch, and output is a new Arrow
    stream — the standard shape for CPU-bound media preprocessing on
    executors. Partition count controls decode parallelism; callers
    repartition upstream if payloads are few-but-huge.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_luma": [d[2] for d in decoded],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        decode_batches, schema=DECODED_IMAGE_SCHEMA
    )


def sample_frames(
    media: DataFrame, chunk_chars: int = 88, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit up to
    ``max_frames`` (media_id, frame_no, frame_b64) rows per payload.
    With a real codec the byte-slicing becomes keyframe extraction;
    the bounded fan-out dataflow — one input row to ≤ max_frames
    output rows, no unbounded explode — is exactly the real
    operator's shape."""
    b64 = F.base64(F.col("payload"))
    n_frames = F.least(
        F.lit(max_frames),
        F.greatest(
            F.lit(1), F.ceil(F.length(b64) / F.lit(chunk_chars)).cast("int")
        ),
    )
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: b64.substr(i * chunk_chars + 1, F.lit(chunk_chars)),
    )
    return media.select(
        "media_id", F.posexplode(frames).alias("frame_no", "frame_b64")
    ).withColumn("frame_no", F.col("frame_no").cast("long"))
