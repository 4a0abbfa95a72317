"""Streaming ingestion into lakehouse tables.

``foreachBatch`` + ``LakeTable.append``: every micro-batch commits one
atomic snapshot, so readers always see a consistent table and each
batch is traceable in the history (`history_df`). Combined with the
checkpoint location, restarts re-deliver only unprocessed batches —
and because each commit stamps ``(stream_query, stream_batch_id)``
into the snapshot summary, a re-delivered batch (checkpoint loss,
crash between commit and checkpoint write) is DETECTED and skipped:
the sink is idempotent per (query, batch id), the lakehouse version of
the exactly-once file-sink contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from pg_lakehouse_spark.lakehouse import LakeTable


def last_committed_batch_id(table: LakeTable, query_name: str) -> int | None:
    """Newest ``stream_batch_id`` committed to ``table``'s current ref
    by the sink named ``query_name`` (None if it never committed).

    Walks the ref's parent chain — NEVER a numeric version range, which
    can interleave other branches' snapshots (see ROUND_NOTES: branch
    versions are global). Metadata-only: one small JSON per ancestor,
    stops at the first hit, so the cost is O(commits since the last
    batch from this query), typically 1-2 reads."""
    for v in table._ancestry(table.current_version()):
        s = table.snapshot(v).summary or {}
        if s.get("stream_query") == query_name:
            bid = s.get("stream_batch_id")
            return int(bid) if bid is not None else None
    return None


def _is_replay(table: LakeTable, query_name: str, batch_id: int) -> bool:
    """True when this (query, batch id) already committed — micro-batch
    ids are monotonically increasing per checkpoint, so `<=` is the
    replay test."""
    last = last_committed_batch_id(table, query_name)
    return last is not None and batch_id <= last


def write_stream_to_lake(
    stream: DataFrame,
    table: LakeTable,
    checkpoint_dir: str,
    trigger_once: bool = False,
    query_name: str = "lake_sink",
) -> StreamingQuery:
    """Start a streaming query appending each micro-batch to ``table``.

    The batch id commits ATOMICALLY with the snapshot (append
    ``summary_extra``), and replayed batch ids are skipped — together
    these make the sink idempotent: a batch is in the table exactly
    once no matter how many times foreachBatch re-delivers it.
    """

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if _is_replay(table, query_name, batch_id):
            return
        table.append(
            batch_df,
            summary_extra={
                "stream_query": query_name,
                "stream_batch_id": batch_id,
                "base_version": table.current_version(),
            },
        )

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
    the table — continuous upsert ingestion at any table size. A batch
    carrying BOTH tombstones and upserts runs the two merges inside a
    LakeTransaction, so they publish as one atomic pointer move —
    readers never observe deletes applied without the batch's upserts,
    and a crash mid-batch leaves the table at the pre-batch snapshot.
    Replayed batch ids (checkpoint loss / crash after commit) are
    detected from the stamped ``(stream_query, stream_batch_id)``
    summary and skipped, so re-delivery cannot double-apply a merge.

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
        if _is_replay(table, query_name, batch_id):
            return
        # last-write-wins compaction inside the batch
        w = (
            F.col(order_col)
            if order_col is not None
            else F.monotonically_increasing_id()
        )
        # The compacted batch feeds up to four consumers (two isEmpty
        # probes + the delete/upsert merges) — persist it once per
        # batch so the groupBy doesn't recompute per consumer. Batch-
        # sized state, dropped before the batch returns.
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
        ).persist()
        base = table.current_version()
        stamp = {"stream_query": query_name, "stream_batch_id": batch_id}
        del_kwargs = dict(
            on=keys,
            when_matched_update=None,
            when_matched_delete=True,
            when_not_matched_insert=False,
            summary_extra=dict(stamp),
        )
        ups_kwargs = dict(
            on=keys,
            when_matched_update={
                c: F.col(f"__src.{c}") for c in data_cols if c not in keys
            },
            when_not_matched_insert=True,
            summary_extra=dict(stamp, base_version=base),
        )
        try:
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
        finally:
            latest.unpersist()

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
