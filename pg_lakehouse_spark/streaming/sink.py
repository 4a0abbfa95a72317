"""Streaming ingestion into lakehouse tables.

``foreachBatch`` + ``LakeTable.append``: every micro-batch commits one
atomic snapshot, so readers always see a consistent table and each
batch is traceable in the history (`history_df`). Combined with the
checkpoint location, restarts re-deliver only unprocessed batches —
the standard exactly-once-per-batch file-sink pattern, but landing in
a *versioned* table instead of bare files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from pg_lakehouse_spark.lakehouse import LakeTable


def write_stream_to_lake(
    stream: DataFrame,
    table: LakeTable,
    checkpoint_dir: str,
    trigger_once: bool = False,
    query_name: str = "lake_sink",
) -> StreamingQuery:
    """Start a streaming query appending each micro-batch to ``table``.

    Batch-id is recorded in the snapshot summary — an idempotency
    breadcrumb: on restart-after-crash the last committed batch id
    tells replay logic what's already in the table.
    """

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        base = table.current_version()
        snap = table.append(batch_df)
        # annotate the freshly-committed snapshot with the batch id
        # (summary is commit metadata; rewrite is driver-local JSON)
        import json

        meta_path = table._meta_path(snap.version)
        with open(meta_path) as f:
            d = json.load(f)
        d["summary"]["stream_batch_id"] = batch_id
        d["summary"]["base_version"] = base
        with open(meta_path + ".tmp", "w") as f:
            json.dump(d, f)
        import os

        os.rename(meta_path + ".tmp", meta_path)

    writer = (
        stream.writeStream.foreachBatch(append_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
