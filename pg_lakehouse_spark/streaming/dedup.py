"""Streaming deduplication — the streaming face of ``llm.dedup``.

A training-data ingest stream re-delivers records (at-least-once
sources, retried producers); dedup must happen *in the stream* so
duplicates never reach the lakehouse sink. Two modes:

- ``stream_dedup(..., watermark=None)``: exact streaming
  ``dropDuplicates`` — state grows with distinct keys forever; only
  for bounded key domains.
- ``stream_dedup(..., watermark="10 minutes")``: watermark-bounded
  ``dropDuplicatesWithinWatermark`` — duplicates arriving within the
  watermark window collapse, state for keys older than the watermark
  is dropped. This is the 100 TB-scale shape: state is O(keys per
  watermark window), not O(all keys ever).

Applied to a BATCH frame the same builder degrades to plain
``dropDuplicates`` so batch backfills and the streaming path share one
definition (same pattern as streaming/windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """One row per key; duplicates within the watermark collapse."""
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    if watermark is None:
        return df.dropDuplicates(keys)
    d = df.withWatermark(ts_col, watermark)
    return d.dropDuplicatesWithinWatermark(keys)
