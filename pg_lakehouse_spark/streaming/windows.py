"""Windowed aggregation builders — tumbling / sliding / session — and a
file-stream source over the events table.

Scale notes: watermark + window aggregation is incremental state that
Spark bounds automatically (state for windows older than the watermark
is dropped); the same builder applied to a batch frame is a plain
shuffle aggregation. Event-time semantics, not processing time, so
results are deterministic and oracle-checkable.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_by: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows: one state bucket per
    (window, keys); late data beyond the watermark is dropped."""
    d = _maybe_watermark(df, ts_col, watermark)
    return d.groupBy(F.window(ts_col, duration), *group_by).agg(*aggs)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_by: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide buckets
    (state fan-out is the scale cost — keep the ratio small)."""
    d = _maybe_watermark(df, ts_col, watermark)
    return d.groupBy(F.window(ts_col, duration, slide), *group_by).agg(*aggs)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_by: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Data-driven session windows: a session extends while events
    arrive within ``gap`` of the last one. Spark merges overlapping
    per-event windows into sessions incrementally."""
    d = _maybe_watermark(df, ts_col, watermark)
    return d.groupBy(F.session_window(ts_col, gap), *group_by).agg(*aggs)


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """The events table as a file stream (the standard replay pattern
    for deterministic streaming tests). Restores the corpus's
    TIMESTAMP(NANOS) column exactly like the batch reader."""
    from pg_lakehouse_spark.tables import table

    batch_schema = table(spark, sf_dir, "events").schema  # post-restore schema
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(sf_dir)
    )
    from pg_lakehouse_spark.timeutil import normalize_ts

    stream = normalize_ts(stream, ("ts",))
    assert stream.schema == batch_schema
    return stream
