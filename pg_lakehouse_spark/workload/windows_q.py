"""Window-function workload — ranking, analytic, frames, grouping sets.

SURVEY.md §2 Tier B rows "Window: ranking", "Window: analytic",
"Grouping sets", "Sort / limit / top-k (per-group)". The reference gets
these from the PG executor (WindowAgg node); here they are native Spark
window expressions — a single shuffle on the partition key, then an
in-partition sort, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pg_lakehouse_spark.timeutil import epoch_us

from pg_lakehouse_spark.workload import register
from pg_lakehouse_spark.workload.util import t, views


@register(
    "q_window_topk_per_group",
    oracle="""
SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
       CAST(rn AS BIGINT) AS rn
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) x
WHERE rn <= 3 AND c_custkey <= 100
""",
    tags=("window", "topk-group"),
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("o_custkey") <= 100))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


@register(
    "q_window_rank_suite",
    oracle="""
SELECT s_suppkey,
       CAST(rank()       OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cdist
FROM supplier
WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
""",
    tags=("window-rank",),
)
def q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = t(spark, sf_dir, "supplier")
    w = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return supp.select(
        "s_suppkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "q_window_running_agg",
    oracle="""
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         AS running_value,
       round(lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
         AS prev_value,
       round(lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
         AS next_value,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
         AS seq
FROM events
WHERE user_id <= 20
""",
    tags=("window-analytic",),
)
def q_window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(wrun), 4).alias("running_value"),
        F.round(F.lag("value").over(wo), 4).alias("prev_value"),
        F.round(F.lead("value").over(wo), 4).alias("next_value"),
        F.row_number().over(wo).cast("long").alias("seq"),
    )


@register(
    "q_window_range_frame",
    oracle="""
SELECT o_orderkey, o_custkey, day_no,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY day_no
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS rolling_30d_spend
FROM (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS day_no
  FROM orders WHERE o_custkey <= 50
) x
""",
    tags=("window-range-frame",),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    day_no = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
    ).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        orders.withColumn("day_no", day_no)
        .select(
            "o_orderkey",
            "o_custkey",
            "day_no",
            F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_30d_spend"),
        )
    )


@register(
    "q_window_first_last",
    oracle="""
SELECT DISTINCT user_id,
       first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
       last_value(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
FROM events
""",
    tags=("window-analytic",),
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_event"),
        F.last("event_type").over(w).alias("last_event"),
    ).distinct()


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube. GROUPING() disambiguates real NULLs from
# super-aggregate rows (identical semantics in Spark and DuckDB).
# ---------------------------------------------------------------------------


@register(
    "q_rollup",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       CAST(grouping(o_orderstatus) + grouping(o_orderpriority) AS BIGINT) AS lvl,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    tags=("rollup",),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") + F.grouping("o_orderpriority"))
            .cast("long")
            .alias("lvl"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "lvl",
            "n",
            "total",
        )
    )


@register(
    "q_cube",
    oracle="""
SELECT coalesce(l_returnflag, '*') AS rflag,
       coalesce(l_linestatus, '*') AS lstatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
       count(*) AS n, round(sum(l_quantity), 2) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("cube",),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("long")
            .alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("*")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("*")).alias("lstatus"),
            "gid",
            "n",
            "qty",
        )
    )


_GROUPING_SETS_SQL = """
SELECT coalesce(c_mktsegment, 'ALL') AS segment,
       CAST(coalesce(c_nationkey, -1) AS BIGINT) AS nation,
       count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_balance
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
"""


@register("q_grouping_sets", oracle=_GROUPING_SETS_SQL, tags=("grouping-sets",))
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir, "customer")
    return spark.sql(_GROUPING_SETS_SQL)


# ---------------------------------------------------------------------------
# As-of join (nearest preceding match) — SURVEY §2 "Joins: range/as-of".
# No native Spark as-of join; composed via operators.joins.asof_join
# (union + last_value trick: one shuffle, no row explosion — scales to
# arbitrarily many right rows per key, unlike join+filter+rank).
# ---------------------------------------------------------------------------


@register(
    "q_asof_join",
    oracle="""
SELECT event_id, user_id, epoch_us(ts) AS ts_us, click_id,
       epoch_us(click_ts) AS click_ts_us
FROM (
  SELECT p.event_id, p.user_id, p.ts,
         c.event_id AS click_id, c.ts AS click_ts,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC NULLS LAST,
                                     c.event_id DESC NULLS LAST) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND c.ts <= p.ts
) x
WHERE rn = 1
""",
    tags=("join-asof",),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_lakehouse_spark.operators.joins import asof_join

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    return asof_join(
        purchases,
        clicks,
        left_on="ts",
        right_on="click_ts",
        left_by="user_id",
        right_by="c_user_id",
        tolerance=None,
        right_tiebreak="click_id",
    ).select(
        "event_id",
        "user_id",
        epoch_us("ts").alias("ts_us"),
        "click_id",
        epoch_us("click_ts").alias("click_ts_us"),
    )


@register(
    "q_window_nth_value",
    oracle="""
SELECT s_suppkey, s_name,
       nth_value(s_name, 2) OVER w AS second_richest,
       first_value(s_name)  OVER w AS richest
FROM supplier
WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window-nth",),
)
def q_window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = t(spark, sf_dir, "supplier")
    w = (
        Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return supp.select(
        "s_suppkey",
        "s_name",
        F.nth_value("s_name", 2).over(w).alias("second_richest"),
        F.first("s_name").over(w).alias("richest"),
    )
