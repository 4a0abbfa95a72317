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


def upsert_stream_to_lake(
    stream: DataFrame,
    table: LakeTable,
    keys: list[str],
    checkpoint_dir: str,
    delete_col: str | None = None,
    order_col: str | None = None,
    trigger_once: bool = False,
    query_name: str = "lake_upsert_sink",
) -> StreamingQuery:
    """CDC-apply sink: each micro-batch MERGEs into ``table`` keyed on
    ``keys`` — updates replace, new keys insert, and (when
    ``delete_col`` names a boolean column) tombstone rows delete.

    The scale shape: with the table in merge-on-read mode each batch
    writes O(batch) rows (delete keys + postimages), never rewriting
    the table — continuous upsert ingestion at any table size. Batch id
    lands in the snapshot summary for replay forensics. A batch
    carrying BOTH tombstones and upserts runs the two merges inside a
    LakeTransaction, so they publish as one atomic pointer move —
    readers never observe deletes applied without the batch's upserts,
    and a crash mid-batch leaves the table at the pre-batch snapshot.

    Within a batch, the row with the greatest ``order_col`` per key
    wins — pass the CDC source's sequence/LSN/timestamp column for
    correct cross-partition ordering. Without ``order_col`` the sink
    falls back to ``monotonically_increasing_id()``, which orders by
    (partition id, offset) — a heuristic that is only arrival order
    within a single input partition; two updates to one key landing in
    different partitions may resolve arbitrarily.
    """
    from pyspark.sql import functions as F

    data_cols = [c for c in stream.columns if c != delete_col]

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # last-write-wins compaction inside the batch
        w = (
            F.col(order_col)
            if order_col is not None
            else F.monotonically_increasing_id()
        )
        latest = (
            batch_df.withColumn("__arrival", w)
            .groupBy(*keys)
            .agg(
                *[
                    F.max_by(F.col(c), F.col("__arrival")).alias(c)
                    for c in batch_df.columns
                    if c not in keys
                ]
            )
        )
        base = table.current_version()
        del_kwargs = dict(
            on=keys,
            when_matched_update=None,
            when_matched_delete=True,
            when_not_matched_insert=False,
            summary_extra={"stream_batch_id": batch_id},
        )
        ups_kwargs = dict(
            on=keys,
            when_matched_update={
                c: F.col(f"__src.{c}") for c in data_cols if c not in keys
            },
            when_not_matched_insert=True,
            summary_extra={"stream_batch_id": batch_id, "base_version": base},
        )
        if delete_col is not None:
            dels = latest.filter(F.col(delete_col)).select(*data_cols)
            ups = latest.filter(~F.col(delete_col)).select(*data_cols)
            have_dels, have_ups = not dels.isEmpty(), not ups.isEmpty()
            if have_dels and have_ups:
                # one atomic publish for the whole batch
                from pg_lakehouse_spark.lakehouse import LakeTransaction

                with LakeTransaction() as tx:
                    tx.merge(table, dels, **del_kwargs)
                    tx.merge(table, ups, **ups_kwargs)
                return
            if have_dels:
                table.merge(dels, **del_kwargs)
            if have_ups:
                table.merge(ups, **ups_kwargs)
            return
        ups = latest.select(*data_cols)
        if not ups.isEmpty():
            table.merge(ups, **ups_kwargs)

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
