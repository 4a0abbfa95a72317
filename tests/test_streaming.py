"""Real Structured Streaming execution: the same window builders run as
readStream queries with watermarks must converge to the batch result,
and a custom stateful operator (applyInPandasWithState) maintains
per-key state across micro-batches."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)
from pg_lakehouse_spark.timeutil import epoch_us

from pg_lakehouse_spark.streaming.windows import stream_events, tumbling_agg
from pg_lakehouse_spark.tables import table


def test_streaming_tumbling_converges_to_batch(spark, sf_dir, tmp_path):
    ev_stream = stream_events(spark, sf_dir)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    ]
    out = tumbling_agg(
        ev_stream, "ts", "1 hour", ["event_type"], aggs, watermark="1 hour"
    ).select(
        epoch_us(F.col("window.start")).alias("ws"), "event_type",
        "n_events", "total_value",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_tumbling")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            tuple(r) for r in spark.table("t_tumbling").collect()
        }
    finally:
        q.stop()

    batch = {
        tuple(r)
        for r in tumbling_agg(
            table(spark, sf_dir, "events"), "ts", "1 hour", ["event_type"], aggs
        )
        .select(
            epoch_us(F.col("window.start")).alias("ws"), "event_type",
            "n_events", "total_value",
        )
        .collect()
    }
    assert streamed == batch


def test_stateful_running_count(spark, sf_dir, tmp_path):
    """Custom stateful operator: per-user cumulative event count via
    applyInPandasWithState — the engine's escape hatch for operators
    Spark lacks (ref SURVEY §2: 'custom stateful streaming')."""
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("total_events", LongType()),
        ]
    )
    state_schema = StructType([StructField("cnt", LongType())])

    def update_count(key, pdfs, state: GroupState):
        n = sum(len(pdf) for pdf in pdfs)
        (cnt,) = state.get if state.exists else (0,)
        cnt += n
        state.update((cnt,))
        yield pd.DataFrame({"user_id": [key[0]], "total_events": [cnt]})

    ev = stream_events(spark, sf_dir)
    counts = ev.groupBy("user_id").applyInPandasWithState(
        update_count,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        # update mode emits one row per key per batch; the final value
        # per key is the cumulative count
        got = (
            spark.table("t_state")
            .groupBy("user_id")
            .agg(F.max("total_events").alias("total_events"))
            .collect()
        )
    finally:
        q.stop()
    expected = {
        r["user_id"]: r["n"]
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r["user_id"]: r["total_events"] for r in got} == expected


def test_stream_static_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static enrichment join (static side re-broadcast per
    micro-batch) + tumbling rollup converges to the batch plan."""
    dim_rows = [
        ("click", "engagement", 1.0),
        ("view", "engagement", 1.0),
        ("purchase", "revenue", 10.0),
        ("error", "ops", 1.0),
        ("login", "ops", 1.0),
    ]
    dim_schema = "event_type string, category string, weight double"
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value") * F.col("weight")) * 100)
        .cast("long")
        .alias("weighted_c"),
    ]

    def enrich(ev):
        dim = spark.createDataFrame(dim_rows, dim_schema)
        return ev.join(F.broadcast(dim), "event_type", "left")

    out = tumbling_agg(
        enrich(stream_events(spark, sf_dir)),
        "ts", "1 hour", ["category"], aggs, watermark="1 hour",
    ).select(
        epoch_us(F.col("window.start")).alias("ws"),
        "category", "n_events", "weighted_c",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_ss_join")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {tuple(r) for r in spark.table("t_ss_join").collect()}
    finally:
        q.stop()
    batch = {
        tuple(r)
        for r in tumbling_agg(
            enrich(table(spark, sf_dir, "events")),
            "ts", "1 hour", ["category"], aggs,
        )
        .select(
            epoch_us(F.col("window.start")).alias("ws"),
            "category", "n_events", "weighted_c",
        )
        .collect()
    }
    assert streamed == batch


def test_stream_sink_into_hidden_partitioned_table(spark, sf_dir, tmp_path):
    """Streaming ingest into a days(ts) hidden-partitioned table: each
    micro-batch append lands hash-distributed into day dirs; the user
    schema stays transform-free and day-range reads prune."""
    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.streaming.sink import write_stream_to_lake
    from pg_lakehouse_spark.streaming.windows import stream_events

    ev_stream = stream_events(spark, sf_dir)
    cat = LakeCatalog(spark, str(tmp_path / "wh_hp"))
    tbl = cat.create_table(
        "db", "events_hp", ev_stream.schema, partition_by=["days(ts)"]
    )
    q = write_stream_to_lake(
        ev_stream, tbl, str(tmp_path / "ckpt_hp"), trigger_once=True
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    ev = table(spark, sf_dir, "events")
    assert tbl.read().count() == ev.count()
    assert set(tbl.read().columns) == set(ev.columns)
    assert all("ts_day=" in f["path"] for f in tbl.snapshot().files)
    lo = "2024-01-02 00:00:00"
    kept, total = tbl.pruned_file_count({"ts": (lo, None)})
    assert kept < total
    assert (
        tbl.read_pruned({"ts": (lo, None)}).count()
        == ev.filter(F.col("ts") >= lo).count()
    )


def test_late_data_dropped_with_watermark(spark, tmp_path):
    """Watermark semantics with a controlled rate: append-mode windows
    close once the watermark passes; late rows beyond it are dropped.
    Uses a file source built on the fly for full control of order."""
    import os

    d = str(tmp_path / "src")
    os.makedirs(d)
    sch = "ts timestamp, v long"

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["ts", "v"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf, sch).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, name))

    write_batch("b1", [("2024-01-01 10:00:00", 1), ("2024-01-01 10:05:00", 2)])

    stream = spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(
        os.path.join(d, "*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.sum("v").alias("s"))
        .select(epoch_us(F.col("window.start")).alias("ws"), "s")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    try:
        q.processAllAvailable()
        # advance event time far enough to close the 10:00 window
        write_batch("b2", [("2024-01-01 11:00:00", 10)])
        q.processAllAvailable()
        closed = spark.table("t_late").collect()
        assert any(r["s"] == 3 for r in closed), closed
        # this row is *behind* the watermark now → must be dropped
        write_batch("b3", [("2024-01-01 10:01:00", 100)])
        q.processAllAvailable()
        after_late = spark.table("t_late").collect()
    finally:
        q.stop()
    assert not any(r["s"] == 100 or r["s"] == 103 for r in after_late), after_late


def test_stream_stream_interval_join(spark, sf_dir, tmp_path):
    """Stream-stream inner join with watermarks + event-time range
    condition (clicks within 30 min before a purchase, same user) —
    must equal the batch join."""

    def sides(df):
        purchases = (
            df.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
                F.col("event_id").alias("p_id"),
            )
        )
        clicks = (
            df.filter(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
                F.col("event_id").alias("c_id"),
            )
        )
        return purchases, clicks

    cond = F.expr(
        "p_user = c_user AND c_ts >= p_ts - INTERVAL 30 MINUTES AND c_ts <= p_ts"
    )

    sp, sc = sides(stream_events(spark, sf_dir))
    joined = (
        sp.withWatermark("p_ts", "1 hour")
        .join(sc.withWatermark("c_ts", "1 hour"), cond, "inner")
        .select("p_id", "c_id")
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["p_id"], r["c_id"]) for r in spark.table("t_ssj").collect()
        }
    finally:
        q.stop()

    bp, bc = sides(table(spark, sf_dir, "events"))
    batch = {
        (r["p_id"], r["c_id"])
        for r in bp.join(bc, cond, "inner").select("p_id", "c_id").collect()
    }
    assert streamed == batch
    assert batch  # non-trivial join


def test_transform_with_state_in_pandas(spark, sf_dir, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary-state API):
    per-user running max event value via a ValueState.

    The API's state-server protocol needs google.protobuf, which this
    container lacks — skipped here, runs wherever protobuf exists
    (applyInPandasWithState covers custom state either way)."""
    pytest.importorskip("google.protobuf.descriptor")
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("max_centivalue", LongType()),
        ]
    )

    class MaxTracker(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "mx", StructType([StructField("m", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            mx = self._state.get()[0] if self._state.exists() else None
            for pdf in rows:
                batch_max = int(round(pdf["value"].max() * 100))
                mx = batch_max if mx is None else max(mx, batch_max)
            self._state.update((mx,))
            yield pd.DataFrame({"user_id": [key[0]], "max_centivalue": [mx]})

        def close(self) -> None:
            pass

    ev = stream_events(spark, sf_dir)
    out = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=MaxTracker(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["user_id"]: r["max_centivalue"]
            for r in spark.table("t_tws")
            .groupBy("user_id")
            .agg(F.max("max_centivalue").alias("max_centivalue"))
            .collect()
        }
    finally:
        q.stop()
    expected = {
        r["user_id"]: int(round(r["m"] * 100))
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max("value").alias("m"))
        .collect()
    }
    assert got == expected


def test_stream_to_lakehouse_sink_and_incremental_read(spark, sf_dir, tmp_path):
    """File stream → foreachBatch append into a versioned LakeTable;
    every micro-batch is one snapshot; incremental reads between
    snapshots recover exactly the per-batch rows."""
    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.streaming.sink import write_stream_to_lake
    from pg_lakehouse_spark.streaming.windows import stream_events

    ev_stream = stream_events(spark, sf_dir)
    cat = LakeCatalog(spark, str(tmp_path / "wh"))
    tbl = cat.create_table("db", "events_lake", ev_stream.schema)
    v0 = tbl.current_version()

    q = write_stream_to_lake(
        ev_stream, tbl, str(tmp_path / "ckpt_sink"), trigger_once=True
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    expected = table(spark, sf_dir, "events").count()
    assert tbl.read().count() == expected
    hist = tbl.history_df().collect()
    appends = [r for r in hist if r["operation"] == "append"]
    assert appends, "stream should have committed append snapshots"
    # snapshot summaries carry the stream batch id
    assert any(
        "stream_batch_id" in s.summary for s in tbl.snapshots()
        if s.operation == "append"
    )
    # incremental read over the whole stream == full table
    assert tbl.read_incremental(v0).count() == expected
    # and per-snapshot increments partition the data
    versions = [s.version for s in tbl.snapshots()]
    total = 0
    for a, b in zip(versions, versions[1:]):
        total += tbl.read_incremental(a, b).count()
    assert total == expected


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming dedup: duplicate keys re-delivered across micro-batches
    within the watermark collapse to one row; the surviving set equals
    the batch dropDuplicates result."""
    import os

    from pg_lakehouse_spark.streaming.dedup import stream_dedup

    d = str(tmp_path / "src")
    os.makedirs(d)
    sch = "ts timestamp, event_id long, v long"

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["ts", "event_id", "v"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf, sch).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, name))

    write_batch(
        "b1",
        [("2024-01-01 10:00:00", 1, 10), ("2024-01-01 10:00:30", 2, 20)],
    )
    write_batch(
        "b2",
        [("2024-01-01 10:01:00", 1, 10),   # duplicate of event 1
         ("2024-01-01 10:01:30", 3, 30)],
    )

    stream = spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(
        os.path.join(d, "*")
    )
    deduped = stream_dedup(stream, ["event_id"], "ts", watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(r["event_id"] for r in spark.table("t_dedup").collect())
    finally:
        q.stop()
    assert got == [1, 2, 3], got

    # batch face of the same builder
    batch = spark.read.schema(sch).parquet(os.path.join(d, "*"))
    assert stream_dedup(batch, ["event_id"]).count() == 3


def test_stream_upsert_sink_cdc_apply(spark, tmp_path):
    """CDC-apply sink: micro-batches of keyed changes MERGE into a
    merge-on-read lake table — updates replace, inserts land,
    tombstones delete, last-write-wins within a batch. Final state
    equals applying the change log in order."""
    import os

    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.streaming.sink import upsert_stream_to_lake

    d = str(tmp_path / "cdc_src")
    os.makedirs(d)
    sch = "k long, v string, is_delete boolean"

    def write_batch(name, rows):
        spark.createDataFrame(rows, sch).coalesce(1).write.parquet(
            os.path.join(d, name)
        )

    # batch 1: k=1,2,3 insert (k=2 updated twice in-batch; last wins)
    write_batch(
        "b1",
        [(1, "a1", False), (2, "b1", False), (2, "b2", False), (3, "c1", False)],
    )
    # batch 2: k=1 update, k=3 tombstone, k=4 insert
    write_batch(
        "b2", [(1, "a2", False), (3, None, True), (4, "d1", False)]
    )

    cat = LakeCatalog(spark, str(tmp_path / "wh_cdc"))
    from pyspark.sql.types import _parse_datatype_string

    tbl = cat.create_table(
        "db",
        "cdc_target",
        _parse_datatype_string("k long, v string"),
        properties={"row_key": "k", "write_delete_mode": "merge-on-read"},
    )
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    q = upsert_stream_to_lake(
        stream,
        tbl,
        keys=["k"],
        checkpoint_dir=str(tmp_path / "ckpt_cdc"),
        delete_col="is_delete",
        trigger_once=True,
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    out = {r.k: r.v for r in tbl.read().collect()}
    assert out == {1: "a2", 2: "b2", 4: "d1"}
    # MoR posture: no full-table rewrites — delete files accumulated
    assert tbl.snapshot().delete_files
    # batch ids recorded for idempotent replay
    summaries = [s.summary for s in tbl.snapshots()]
    assert any("stream_batch_id" in s for s in summaries if s)
    # the tombstone+upsert batch published BOTH merges as one atomic
    # pointer move (LakeTransaction), not two visible commits
    assert any(s.get("txn_ops") == ["merge", "merge"] for s in summaries if s)


def test_stream_sink_replay_skipped(spark, tmp_path):
    """Idempotent re-delivery: losing the checkpoint replays the same
    micro-batch ids — the sink detects the stamped (stream_query,
    stream_batch_id) in the snapshot summary and skips, so rows land
    exactly once."""
    import os

    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.streaming.sink import (
        last_committed_batch_id,
        write_stream_to_lake,
    )

    d = str(tmp_path / "replay_src")
    os.makedirs(d)
    sch = "k long, v string"
    spark.createDataFrame([(1, "a"), (2, "b")], sch).coalesce(1).write.parquet(
        os.path.join(d, "b1")
    )
    cat = LakeCatalog(spark, str(tmp_path / "wh_replay"))
    tbl = cat.create_table(
        "db", "replay_t", spark.createDataFrame([(1, "a")], sch).schema
    )
    src = spark.readStream.schema(sch).parquet(os.path.join(d, "*"))

    def run(ckpt):
        q = write_stream_to_lake(
            src, tbl, str(tmp_path / ckpt), trigger_once=True
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()

    run("ckpt1")
    assert tbl.read().count() == 2
    assert last_committed_batch_id(tbl, "lake_sink") == 0
    v_after_first = tbl.current_version()
    # checkpoint lost -> batch 0 re-delivered -> skipped, no new commit
    run("ckpt2")
    assert tbl.read().count() == 2
    assert tbl.current_version() == v_after_first


def test_stream_upsert_replay_skipped(spark, tmp_path):
    """CDC sink idempotency: re-delivering already-committed batch ids
    must not double-apply merges (a replayed tombstone+insert batch
    would otherwise re-insert deleted keys via last-write-wins)."""
    import os

    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.streaming.sink import upsert_stream_to_lake
    from pyspark.sql.types import _parse_datatype_string

    d = str(tmp_path / "cdc_replay_src")
    os.makedirs(d)
    sch = "k long, v string, is_delete boolean"
    spark.createDataFrame(
        [(1, "a1", False), (2, "b1", False)], sch
    ).coalesce(1).write.parquet(os.path.join(d, "b1"))
    spark.createDataFrame(
        [(1, "a2", False), (2, None, True)], sch
    ).coalesce(1).write.parquet(os.path.join(d, "b2"))

    cat = LakeCatalog(spark, str(tmp_path / "wh_cdc_replay"))
    tbl = cat.create_table(
        "db",
        "cdc_replay",
        _parse_datatype_string("k long, v string"),
        properties={"row_key": "k", "write_delete_mode": "merge-on-read"},
    )
    src = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )

    def run(ckpt):
        q = upsert_stream_to_lake(
            src,
            tbl,
            keys=["k"],
            checkpoint_dir=str(tmp_path / ckpt),
            delete_col="is_delete",
            trigger_once=True,
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()

    run("ck1")
    assert {r.k: r.v for r in tbl.read().collect()} == {1: "a2"}
    v = tbl.current_version()
    run("ck2")  # replayed batches 0,1 -> both skipped
    assert {r.k: r.v for r in tbl.read().collect()} == {1: "a2"}
    assert tbl.current_version() == v


def test_stream_into_branch_then_publish(spark, sf_dir, tmp_path):
    """Streaming write-audit-publish: micro-batches land on a branch
    (main readers see a stable table mid-ingest), an audit checks the
    staged rows, then fast-forward publishes the whole ingest as one
    pointer move."""
    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.streaming.sink import write_stream_to_lake
    from pg_lakehouse_spark.streaming.windows import stream_events

    ev_stream = stream_events(spark, sf_dir)
    cat = LakeCatalog(spark, str(tmp_path / "wh_wap"))
    tbl = cat.create_table("db", "events_wap", ev_stream.schema)
    tbl.create_branch("ingest")
    q = write_stream_to_lake(
        ev_stream,
        tbl.for_branch("ingest"),
        str(tmp_path / "ckpt_wap"),
        trigger_once=True,
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    ev = table(spark, sf_dir, "events")
    # main untouched mid-ingest; branch holds the batch
    assert tbl.read().count() == 0
    staged = tbl.for_branch("ingest").read()
    assert staged.count() == ev.count()
    # audit passes -> publish is a metadata-only pointer move
    assert staged.filter(F.col("ts").isNull()).count() == 0
    tbl.fast_forward("ingest")
    assert tbl.read().count() == ev.count()


def test_stream_changes_cdc_source(spark, tmp_path):
    """Streaming the change feed: each commit's row-level changes
    arrive exactly once across restarts; DML emits pre/post images;
    a second run delivers only commits made after the first."""
    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.streaming.cdc import stream_changes

    cat = LakeCatalog(spark, str(tmp_path / "wh_cdcsrc"))
    tbl = cat.create_table(
        "db",
        "cdc_src_t",
        spark.createDataFrame([(1, "a")], "k long, v string").schema,
        properties={"change_data_feed": "on"},
    )
    tbl.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    tbl.update(F.col("k") == 1, {"v": F.lit("a2")})

    got: list = []

    def collect_changes(df, batch_id):
        got.extend(
            (r.k, r.v, r._change_type, r._commit_version) for r in df.collect()
        )

    def run():
        q = stream_changes(
            tbl, collect_changes, str(tmp_path / "ckpt_cdcsrc"),
            trigger_once=True,
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()

    run()
    types = {(r[0], r[2]) for r in got}
    assert (1, "insert") in types and (2, "insert") in types
    assert (1, "update_preimage") in types and (1, "update_postimage") in types
    first_count = len(got)
    # new commits after the first run: only the delta is delivered
    tbl.delete(F.col("k") == 2)
    run()
    new = got[first_count:]
    assert {(r[0], r[2]) for r in new} == {(2, "delete")}
    # re-run with no new commits: nothing re-delivered
    n = len(got)
    run()
    assert len(got) == n


def test_stream_changes_delivers_published_branch(spark, tmp_path):
    """WAP + CDC: commits land on a branch (parked by the feed — not
    on main's ancestry), then fast-forward publishes them WITHOUT
    writing any new metadata file; the pending ledger must surface
    them in the next batch."""
    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.streaming.cdc import stream_changes

    cat = LakeCatalog(spark, str(tmp_path / "wh_wapcdc"))
    tbl = cat.create_table(
        "db", "wap_cdc",
        spark.createDataFrame([(1, "a")], "k long, v string").schema,
        properties={"change_data_feed": "on"},
    )
    got: list = []

    def run():
        q = stream_changes(
            tbl,
            lambda df, bid: got.extend(
                (r.k, r._change_type) for r in df.collect()
            ),
            str(tmp_path / "ckpt_wapcdc"),
            trigger_once=True,
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()

    tbl.create_branch("ingest")
    b = tbl.for_branch("ingest")
    b.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    run()
    assert got == []  # branch commits parked, main untouched
    tbl.fast_forward("ingest")
    run()  # publish wrote NO metadata file; ledger must deliver
    assert {(r[0], r[1]) for r in got} == {(1, "insert"), (2, "insert")}
    # and they are not re-delivered afterwards
    n = len(got)
    run()
    assert len(got) == n


def test_stream_changes_long_running_publish_liveness(spark, tmp_path):
    """r3 verdict item 5 (the remaining gap): a LONG-RUNNING stream
    that already listed a branch's metadata files must deliver them
    after fast-forward even though the publish writes no new file —
    the ledger re-checks on the rate-tick cadence instead of waiting
    for the next unrelated commit or a restart."""
    import time

    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.streaming.cdc import stream_changes

    cat = LakeCatalog(spark, str(tmp_path / "wh_livecdc"))
    tbl = cat.create_table(
        "db", "live_cdc",
        spark.createDataFrame([(1, "a")], "k long, v string").schema,
        properties={"change_data_feed": "on"},
    )
    got: list = []
    q = stream_changes(
        tbl,
        lambda df, bid: got.extend(
            (r.k, r._change_type) for r in df.collect()
        ),
        str(tmp_path / "ckpt_livecdc"),
        ledger_poll_secs=1,
    )
    try:
        tbl.create_branch("ingest")
        b = tbl.for_branch("ingest")
        b.append(
            spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        )
        # let the stream list + park the branch commit (ledger write)
        deadline = time.time() + 60
        pending = str(tmp_path / "ckpt_livecdc" / "_lake_pending.json")
        import os as _os

        while time.time() < deadline and not _os.path.exists(pending):
            time.sleep(0.5)
        assert got == []  # parked, not delivered pre-publish
        tbl.fast_forward("ingest")
        # NO further commit, NO restart: the tick must deliver
        while time.time() < deadline and len(got) < 2:
            time.sleep(0.5)
        assert {(r[0], r[1]) for r in got} == {(1, "insert"), (2, "insert")}
    finally:
        q.stop()
