"""Streaming-window workload — batch-mode semantics of the streaming
tier, oracle-checked (window math is identical in both modes; the
streaming execution itself is covered by tests/test_streaming.py).

Window starts are emitted as epoch microseconds (BIGINT) so the hash
comparison never depends on timestamp rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pg_lakehouse_spark.timeutil import epoch_us

from pg_lakehouse_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg
from pg_lakehouse_spark.workload import register
from pg_lakehouse_spark.workload.util import t


@register(
    "stream_tumbling_hourly",
    oracle="""
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("streaming", "window-tumbling"),
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    out = tumbling_agg(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        ],
    )
    return out.select(
        epoch_us(F.col("window.start")).alias("window_start_us"),
        "event_type",
        "n_events",
        "total_value",
    )


@register(
    "stream_sliding_30m",
    oracle="""
WITH exploded AS (
  SELECT unnest([
           to_timestamp(floor(epoch(ts) / 1800) * 1800),
           to_timestamp(floor(epoch(ts) / 1800) * 1800) - INTERVAL 30 MINUTE
         ]) AS window_start,
         user_id, value
  FROM events
)
SELECT epoch_us(window_start) AS window_start_us,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(round(sum(value) * 100) AS BIGINT) AS value_sum_c
FROM exploded
GROUP BY 1
""",
    tags=("streaming", "window-sliding"),
)
def stream_sliding_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min — every event lands in
    exactly two windows (the oracle materializes that fan-out
    explicitly)."""
    ev = t(spark, sf_dir, "events")
    out = sliding_agg(
        ev,
        "ts",
        "1 hour",
        "30 minutes",
        [],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value") * 100)
            .cast("long")
            .alias("value_sum_c"),
        ],
    )
    return out.select(
        epoch_us(F.col("window.start")).alias("window_start_us"),
        "n_events",
        "n_users",
        "value_sum_c",
    )


@register(
    "stream_session_windows",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) + 1800 * 1000000 AS session_end_us,
       count(*) AS n_events,
       round(sum(value), 4) AS session_value
FROM numbered
GROUP BY user_id, session_no
""",
    tags=("streaming", "window-session"),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user. Spark's session_window end =
    last event + gap; the gaps-and-islands oracle reproduces exactly
    that."""
    ev = t(spark, sf_dir, "events")
    out = session_agg(
        ev,
        "ts",
        "30 minutes",
        ["user_id"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        ],
    )
    return out.select(
        "user_id",
        epoch_us(F.col("session_window.start")).alias("session_start_us"),
        epoch_us(F.col("session_window.end")).alias("session_end_us"),
        "n_events",
        "session_value",
    )


@register(
    "stream_dedup_events",
    oracle="""
SELECT DISTINCT event_id, CAST(1 AS BIGINT) AS n
FROM (
  SELECT event_id FROM events WHERE event_id < 2000
  UNION ALL
  SELECT event_id FROM events WHERE event_id < 1000   -- redelivered
)
""",
    tags=("streaming", "dedup"),
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once redelivery collapsed by the streaming dedup
    builder (batch face here; stream/batch convergence proven in
    test_stream_dedup_within_watermark). The oracle counts each key
    once regardless of redelivery."""
    from pg_lakehouse_spark.streaming.dedup import stream_dedup

    ev = t(spark, sf_dir, "events")
    first = ev.filter(F.col("event_id") < 2000).select("event_id", "ts")
    redelivered = ev.filter(F.col("event_id") < 1000).select("event_id", "ts")
    deduped = stream_dedup(first.unionByName(redelivered), ["event_id"], "ts")
    return deduped.select("event_id", F.lit(1).cast("long").alias("n"))


@register(
    "stream_static_join",
    oracle="""
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       CASE WHEN event_type IN ('click', 'view') THEN 'engagement'
            WHEN event_type = 'purchase' THEN 'revenue'
            ELSE 'ops' END AS category,
       count(*) AS n_events,
       CAST(round(sum(value * CASE WHEN event_type = 'purchase' THEN 10.0
                                   ELSE 1.0 END) * 100) AS BIGINT) AS weighted_c
FROM events
GROUP BY 1, 2
""",
    tags=("streaming", "join-stream-static"),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: a (small, broadcast) dimension
    maps event_type -> (category, weight); the enriched stream rolls
    up into tumbling windows. In streaming mode the static side is
    re-broadcast per micro-batch (Structured Streaming stream-static
    join); the batch face here is the same plan minus the trigger —
    `tests/test_streaming.py::test_stream_static_join_matches_batch`
    proves equivalence on a real stream."""
    ev = t(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [
            ("click", "engagement", 1.0),
            ("view", "engagement", 1.0),
            ("purchase", "revenue", 10.0),
            ("error", "ops", 1.0),
            ("login", "ops", 1.0),
        ],
        "event_type string, category string, weight double",
    )
    enriched = ev.join(F.broadcast(dim), "event_type", "left").withColumn(
        "category", F.coalesce(F.col("category"), F.lit("ops"))
    ).withColumn("weight", F.coalesce(F.col("weight"), F.lit(1.0)))
    out = tumbling_agg(
        enriched,
        "ts",
        "1 hour",
        ["category"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") * F.col("weight")) * 100)
            .cast("long")
            .alias("weighted_c"),
        ],
    )
    return out.select(
        epoch_us(F.col("window.start")).alias("window_start_us"),
        "category",
        "n_events",
        "weighted_c",
    )


@register(
    "stream_cdc_pipeline",
    oracle="""
SELECT o_orderkey AS k,
       CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice * 2, 2)
            ELSE round(o_totalprice, 2) END AS price
FROM orders
WHERE o_orderkey <= 600 AND o_orderkey % 5 != 0
""",
    tags=("streaming", "cdc-source"),
)
def stream_cdc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end CDC replication over the streaming change-feed
    source: DML lands on a source lake table (insert + update +
    delete), `stream_changes` tails its commit log and MERGEs each
    batch's row-level changes into a replica — the replica must equal
    the net effect of the DML sequence (the oracle states it
    directly). Cost per batch is O(changed rows) on both sides."""
    import os as _os

    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.streaming.cdc import (
        replicate_changes,
        stream_changes,
    )
    from pg_lakehouse_spark.workload.lake_q import _scratch_catalog

    orders = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice"), 2).alias("price"),
    )
    cat = _scratch_catalog(spark, sf_dir, "cdc_pipeline")
    src = cat.create_table(
        "db", "cdc_src", orders.schema,
        properties={"change_data_feed": "on", "row_key": "k",
                    "write_delete_mode": "merge-on-read"},
    )
    src.append(orders.filter(F.col("k") <= 600))
    src.update(F.col("k") % 7 == 0, {"price": F.round(F.col("price") * 2, 2)})
    src.delete(F.col("k") % 5 == 0)

    target = cat.create_table("db", "cdc_replica", orders.schema)

    def apply_changes(changes, batch_id):
        replicate_changes(changes, target, keys=["k"])

    ckpt = _os.path.join(cat.warehouse, "_cdc_ckpt")
    q = stream_changes(src, apply_changes, ckpt, trigger_once=True)
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    return target.read().select("k", "price")


@register(
    "ts_gapfill_hourly",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket, event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_e2
  FROM events GROUP BY 1, 2
), thin AS (
  SELECT * FROM hourly WHERE n_events >= 3
), bounds AS (
  SELECT min(bucket) AS lo, max(bucket) AS hi FROM thin
), grid AS (
  SELECT s.event_type, g.bucket
  FROM (SELECT DISTINCT event_type FROM thin) s
  CROSS JOIN (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
    FROM bounds
  ) g
), j AS (
  SELECT grid.event_type, grid.bucket, thin.n_events, thin.sum_e2
  FROM grid LEFT JOIN thin USING (event_type, bucket)
)
SELECT epoch_us(bucket) AS bucket_us, event_type,
       COALESCE(n_events, 0) AS n_events,
       last_value(sum_e2 IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS sum_e2,
       n_events IS NULL AS is_gap
FROM j
""",
    tags=("timeseries", "gapfill"),
)
def ts_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled dense hourly series (Timescale time_bucket_gapfill
    analog): sparse (series, bucket) rows densify onto the global
    bucket grid; counts zero-fill, the gauge metric carries forward
    (LOCF). Sum runs on the cent grid so both engines are exact."""
    from pg_lakehouse_spark.operators.timeseries import fill_gaps

    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_e2"),
    )
    thin = hourly.filter(F.col("n_events") >= 3)
    filled = fill_gaps(
        thin, "bucket", "1 HOUR", ["event_type"],
        {"n_events": "zero", "sum_e2": "locf"},
    )
    return filled.select(
        epoch_us(F.col("bucket")).alias("bucket_us"),
        "event_type", "n_events", "sum_e2", "is_gap",
    )


@register(
    "ts_sessionize_users",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS b
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts, event_type,
         CAST(sum(b) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_no
  FROM marked
)
SELECT user_id, session_no,
       CAST(count(*) AS BIGINT) AS n_events,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) AS session_end_us
FROM sess
GROUP BY user_id, session_no
""",
    tags=("timeseries", "sessionize"),
)
def ts_sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-minute silence cuts a session): the
    lag-compare + running-sum formulation — one shuffle on user_id —
    rolled up to per-session summaries. The batch twin of the
    streaming session_window aggregate."""
    from pg_lakehouse_spark.operators.timeseries import sessionize

    ev = t(spark, sf_dir, "events")
    s = sessionize(ev, "ts", ["user_id"], "30 minutes")
    return s.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        epoch_us(F.min("ts")).alias("session_start_us"),
        epoch_us(F.max("ts")).alias("session_end_us"),
    )


@register(
    "q_date_bin_buckets",
    oracle="""
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts,
                            TIMESTAMP '2001-01-01'),
                '%Y-%m-%d %H:%M:%S')               AS bucket,
       event_type,
       count(*)                                    AS n
FROM events
WHERE event_id <= 3000
GROUP BY 1, 2
""",
    tags=("timeseries", "sql-frontend"),
)
def q_date_bin_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11: PG 14 date_bin with the interval-typed stride —
    origin-aligned floor bucketing (DuckDB's time_bucket with an
    origin computes the identical grid, so this is value-hash
    checked). 100 TB posture: the bin is a pure expression on the
    scan (no UDF); the groupBy shuffles on (bucket, type) exactly
    like any hourly rollup."""
    import os as _os
    import tempfile as _tf

    from pg_lakehouse_spark.lakehouse import LakeCatalog
    from pg_lakehouse_spark.sql import LakeSQL

    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    q = LakeSQL(
        spark,
        LakeCatalog(spark, _os.path.join(_tf.gettempdir(), "wl_datebin")),
    )
    return q.sql(
        "SELECT to_char(date_bin(interval '15 minutes', ts, "
        "timestamp '2001-01-01'), 'YYYY-MM-DD HH24:MI:SS') AS bucket, "
        "event_type, count(*) AS n "
        "FROM events WHERE event_id <= 3000 "
        "GROUP BY 1, 2"
    )
