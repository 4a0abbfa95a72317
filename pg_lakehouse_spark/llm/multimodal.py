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
    ArrayType,
    BinaryType,
    DoubleType,
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


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extract binary payloads → fixed-dim float vector
    (media_id, feature) — the embed-the-image stage of a multimodal
    pipeline, Arrow-batched like ``decode_images``. The output plugs
    straight into the similarity stack (cosine_topk / ANN / near-dup).

    The featurizer is the documented STUB (same inputs as the decode
    stub: payload length + first-64-byte checksum, expanded to ``dim``
    deterministic values); swap in a real vision encoder via the same
    mapInPandas shape and nothing downstream changes.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    continue
                n = len(p)
                checksum = sum(p[:64]) if n else 0
                feats.append(
                    [
                        ((checksum * (i + 1) + n * i) % 1009) / 1009.0
                        for i in range(dim)
                    ]
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.select("media_id", "payload").mapInPandas(
        featurize, schema=FEATURE_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("scale_x_e4", LongType(), True),
        StructField("scale_y_e4", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Resize plumbing: decode source dims (stub), emit the target-dim
    payload plus the applied scale factors (e4-scaled ints — exact to
    compare across engines). The stub "resample" tiles/truncates the
    source bytes to the target byte budget (w*h/64) — deterministic
    and size-correct; a real implementation swaps in PIL's
    ``Image.resize`` under the identical batch shape.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        budget = max(1, target_w * target_h // 64)
        for pdf in batches:
            rows = {
                "media_id": pdf["media_id"],
                "width": [],
                "height": [],
                "scale_x_e4": [],
                "scale_y_e4": [],
                "payload": [],
            }
            for p in pdf["payload"]:
                if p is None or len(p) == 0:
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["scale_x_e4"].append(None)
                    rows["scale_y_e4"].append(None)
                    rows["payload"].append(None)
                    continue
                w, h, _ = _decode_image_stub(p)
                reps = budget // len(p) + 1
                rows["width"].append(target_w)
                rows["height"].append(target_h)
                # half-away-from-zero (SQL round), not Python's
                # banker's rounding — keeps the oracle comparable
                rows["scale_x_e4"].append(int(target_w / w * 10000 + 0.5))
                rows["scale_y_e4"].append(int(target_h / h * 10000 + 0.5))
                rows["payload"].append((bytes(p) * reps)[:budget])
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        resize_batches, schema=RESIZED_SCHEMA
    )


# -- audio --------------------------------------------------------------------

AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms_e4", LongType(), True),
        StructField("crossings", LongType(), True),
    ]
)


def synthesize_audio(
    df: DataFrame, id_col: str, text_col: str, sample_rate: int = 16000
) -> DataFrame:
    """Deterministic audio table from a text corpus: payload bytes ARE
    the 8-bit PCM samples (format 'pcm8'), so the decode below is a
    real byte→sample decode, not a fake."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("audio").alias("media_type"),
        F.lit("pcm8").alias("format"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias(
            "payload_bytes"
        ),
        F.lit(sample_rate).alias("sample_rate"),
        F.concat(F.lit("synthetic://audio/"), F.col(id_col)).alias(
            "source_uri"
        ),
    )


def decode_audio(media: DataFrame, sample_rate: int = 16000) -> DataFrame:
    """Waveform statistics per payload — duration, RMS energy (around
    the 8-bit midpoint 128), mean-crossing count (the silence/speech
    heuristic). numpy over Arrow batches via ``mapInPandas``; swap the
    pcm8 interpretation for soundfile/ffmpeg decode when codecs exist
    — the batch dataflow is identical. IEEE sqrt is correctly rounded,
    so the stats are engine-exact (DuckDB-oracle-checkable) unlike
    transcendental scores."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"], "n_samples": [],
                   "duration_ms": [], "rms_e4": [], "crossings": []}
            for p in pdf["payload"]:
                if p is None or len(p) == 0:
                    out["n_samples"].append(0)
                    out["duration_ms"].append(0)
                    out["rms_e4"].append(0)
                    out["crossings"].append(0)
                    continue
                arr = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
                n = arr.size
                rms = float(np.sqrt(((arr - 128.0) ** 2).sum() / n))
                mu = arr.sum() / n
                above = arr > mu
                out["n_samples"].append(n)
                out["duration_ms"].append(int(n * 1000 // sample_rate))
                out["rms_e4"].append(int(rms * 10000 // 1))
                out["crossings"].append(int((above[1:] != above[:-1]).sum()))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=AUDIO_SCHEMA
    )
