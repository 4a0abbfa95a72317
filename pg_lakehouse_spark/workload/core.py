"""Core relational workload — scan / filter / join / aggregate / set ops.

Covers SURVEY.md §2 Tier B rows: scan+filter+agg (reference delivers
these via the PG executor over iceberg_am tables, iceberg_am.c:455-518),
equi/semi/anti/outer/cross/non-equi joins, subqueries, CTEs, set ops.

Every query is declarative DataFrame/SQL — Catalyst handles pushdown,
pruning, join strategy (broadcast for dims), and AQE handles runtime
coalescing/skew. No collect(), no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_lakehouse_spark.workload import register
from pg_lakehouse_spark.workload.util import t, views

# ---------------------------------------------------------------------------
# q1: pricing summary — scan → filter → hash agg (partial+final) → sort.
# TPC-H Q1 shape. Filter pushes to parquet scan; agg is map-side partial.
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg", "filter", "scan"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q6: pure filter + global agg — the predicate-pushdown showcase (ref A5,
# scan_ops.c:174 TODO in the reference; free in Spark).
# ---------------------------------------------------------------------------


@register(
    "q6_revenue_forecast",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    tags=("filter", "agg"),
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# q3: shipping priority — customer ⋈ orders ⋈ lineitem, agg, top-k.
# customer is filtered small at bench scale — AQE's runtime size check
# broadcasts it there, but no HINT forces it: customer grows linearly
# with scale factor and a forced broadcast would OOM at 100 TB.
# orders⋈lineitem is a shuffle join on o_orderkey (the natural
# co-partition key at scale).
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(
            orders.join(
                cust, orders.o_custkey == cust.c_custkey
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q4: order priority checking — EXISTS → left-semi join (ref Tier B
# "Joins: semi/anti").
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
""",
    tags=("join-semi", "agg"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    joined = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# q_anti_join: customers with no orders — NOT EXISTS → left-anti join.
# ---------------------------------------------------------------------------


@register(
    "q_anti_join",
    oracle="""
SELECT c_nationkey, count(*) AS n_customers_without_orders
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
""",
    tags=("join-anti", "agg"),
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
    )


# ---------------------------------------------------------------------------
# q5: local supplier volume — 6-way join across the star schema.
# region/nation are tiny (safe to HINT broadcast: constant size);
# supplier/customer grow with sf — AQE decides those at runtime;
# the only shuffles are orders⋈lineitem and the final agg.
# ---------------------------------------------------------------------------


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
    tags=("join", "agg"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    nr = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    s = supp.join(nr, supp.s_nationkey == nr.n_nationkey)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey))
        .filter(cust.c_nationkey == s.s_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# q10: returned items — wide group-by over a 4-way join.
# ---------------------------------------------------------------------------


@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q13: customer order-count distribution — LEFT OUTER join + double agg.
# ---------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
""",
    tags=("join-outer", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# q14: promo revenue — conditional aggregation (CASE WHEN inside SUM).
# ---------------------------------------------------------------------------


@register(
    "q14_promo_revenue",
    oracle="""
SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-02-01'
""",
    tags=("join", "agg", "case"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").like("PROMO%"), disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q17: small-quantity revenue — per-key scalar aggregate feeding a filter
# (decorrelated subquery). Spark: groupBy + re-join (shuffle on l_partkey
# both sides → AQE may pick shuffled hash join).
# ---------------------------------------------------------------------------


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH part_avg AS (
  SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS half_avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem, part, part_avg
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#3'
  AND pk = l_partkey
  AND l_quantity < half_avg_qty
""",
    tags=("join", "subquery", "agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(part_avg, li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# q18: large orders — grouped HAVING feeding an IN-subquery (semi join).
# ---------------------------------------------------------------------------


@register(
    "q18_large_volume_orders",
    oracle="""
SELECT c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS totalprice, round(sum(l_quantity), 2) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 120
  )
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
    tags=("join-semi", "having", "agg"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 120)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "bk"),
                    F.col("o_orderkey") == F.col("bk"), "left_semi")
        # no broadcast hint on customer: it grows linearly with scale
        # factor (unlike region/nation) — let AQE's size check pick the
        # strategy; at sf0.1 it still broadcasts, at 100× it won't OOM
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# Scalar + correlated subqueries.
# ---------------------------------------------------------------------------


@register(
    "q_scalar_subquery",
    oracle="""
SELECT count(*) AS n_above_avg
FROM part
WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
""",
    tags=("subquery",),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT count(*) AS n_above_avg
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        """
    )


@register(
    "q_correlated_subquery",
    oracle="""
SELECT c_custkey, round(c_acctbal, 2) AS acctbal
FROM customer c
WHERE c_acctbal > (
  SELECT avg(c2.c_acctbal) * 1.5 FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
""",
    tags=("subquery-correlated",),
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE c_acctbal > (
          SELECT avg(c2.c_acctbal) * 1.5 FROM customer c2
          WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


_CTE_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue > (SELECT avg(total_revenue) FROM revenue)
"""


@register("q_cte_top_supplier", oracle=_CTE_SQL, tags=("cte", "subquery"))
def q_cte_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_CTE_SQL)


# ---------------------------------------------------------------------------
# Set operations.
# ---------------------------------------------------------------------------


@register(
    "q_union_all",
    oracle="""
SELECT k, kind FROM (
  SELECT c_custkey AS k, 'customer' AS kind FROM customer WHERE c_acctbal > 9000
  UNION ALL
  SELECT o_custkey AS k, 'bigorder' AS kind FROM orders WHERE o_totalprice > 400000
) u
""",
    tags=("setop",),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("k"), F.lit("customer").alias("kind"))
    )
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("k"), F.lit("bigorder").alias("kind"))
    )
    return cust.unionByName(orders)


@register(
    "q_intersect",
    oracle="""
SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
""",
    tags=("setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    )
    b = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("k"))
    )
    return a.intersect(b)


@register(
    "q_except",
    oracle="""
SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
EXCEPT
SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
""",
    tags=("setop",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    )
    b = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("k"))
    )
    return a.exceptAll(b).distinct()


# ---------------------------------------------------------------------------
# Bag-semantics set ops (PG INTERSECT ALL / EXCEPT ALL). Both inputs keep
# duplicate o_custkey rows, so the multiset min/difference counts matter —
# distinct-flavoured set ops would give a different answer. Spark plans
# these as a single hash aggregate over both sides (no sort), which scales
# the same as any groupBy on the key.
# ---------------------------------------------------------------------------


@register(
    "q_intersect_all",
    oracle="""
SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT ALL
SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
""",
    tags=("setop",),
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    b = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("k")
    )
    return a.intersectAll(b)


@register(
    "q_except_all",
    oracle="""
SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
EXCEPT ALL
SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
""",
    tags=("setop",),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("k")
    )
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    return a.exceptAll(b)


# ---------------------------------------------------------------------------
# LATERAL correlated subquery join (PG LATERAL; Spark native since 3.2).
# Top-2 customers by balance per nation. Catalyst decorrelates this into
# a window-ranked join — same plan shape as the explicit row_number()
# formulation, so it scales as one shuffle on the correlation key.
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT n_name, c.c_custkey, c.c_acctbal
FROM nation, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) c
"""


@register("q_lateral_join", oracle=_LATERAL_SQL, tags=("join-lateral",))
def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir, "nation", "customer")
    return spark.sql(_LATERAL_SQL)


@register(
    "q_cross_join",
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""",
    tags=("join-cross",),
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "region")
        .crossJoin(t(spark, sf_dir, "nation"))
        .select("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Non-equi / range join: orders binned into literal price bands.
# The band table is tiny → broadcast nested loop, the correct plan at any
# scale (bands never grow with data).
# ---------------------------------------------------------------------------


@register(
    "q_range_join_bands",
    oracle="""
WITH bands(band, lo, hi) AS (
  VALUES ('small', 0.0, 50000.0),
         ('medium', 50000.0, 150000.0),
         ('large', 150000.0, 1e12)
)
SELECT band, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
""",
    tags=("join-range",),
)
def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 50000.0), ("medium", 50000.0, 150000.0),
         ("large", 150000.0, 1e12)],
        "band string, lo double, hi double",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregation breadth: distinct / multi-distinct / stddev / having.
# ---------------------------------------------------------------------------


@register(
    "q_distinct_agg",
    oracle="""
SELECT o_orderstatus,
       count(DISTINCT o_custkey)  AS n_customers,
       count(DISTINCT o_orderpriority) AS n_priorities,
       count(*) AS n_orders,
       round(stddev_samp(o_totalprice), 2) AS sd_price,
       round(var_samp(o_totalprice), 2) AS var_price,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders
GROUP BY o_orderstatus
""",
    tags=("agg-distinct",),
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.stddev_samp("o_totalprice"), 2).alias("sd_price"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "q_having",
    oracle="""
SELECT l_suppkey, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty
FROM lineitem
GROUP BY l_suppkey
HAVING sum(l_quantity) > 10000 AND count(*) > 100
""",
    tags=("agg", "having"),
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.sum("l_quantity").alias("_sq"),
        )
        .filter((F.col("_sq") > 10000) & (F.col("n_items") > 100))
        .drop("_sq")
    )


@register(
    "q_distinct_rows",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    tags=("distinct",),
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# Top-k: global ORDER BY ... LIMIT — Spark plans TakeOrderedAndProject
# (no full sort materialization; per-partition heap + driver merge).
# ---------------------------------------------------------------------------


@register(
    "q_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    tags=("topk", "sort"),
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
        .select(
            "o_orderkey", "o_custkey", F.round(F.col("o_totalprice"), 2).alias("totalprice")
        )
    )


# ---------------------------------------------------------------------------
# Outer-join breadth: full outer / right outer / NOT-IN null semantics.
# ---------------------------------------------------------------------------


@register(
    "q_full_outer_join",
    oracle="""
SELECT coalesce(c.c_custkey, o.k) AS custkey,
       CASE WHEN c.c_custkey IS NULL THEN 'order_only'
            WHEN o.k IS NULL THEN 'customer_only'
            ELSE 'both' END AS side,
       coalesce(o.n_orders, 0) AS n_orders
FROM (SELECT c_custkey FROM customer WHERE c_custkey <= 800) c
FULL OUTER JOIN (
  SELECT o_custkey AS k, count(*) AS n_orders
  FROM orders WHERE o_custkey BETWEEN 400 AND 1200
  GROUP BY o_custkey
) o ON c.c_custkey = o.k
""",
    tags=("join-full-outer",),
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 800)
        .select("c_custkey")
    )
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").between(400, 1200))
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    joined = cust.join(orders, cust.c_custkey == orders.k, "full_outer")
    return joined.select(
        F.coalesce("c_custkey", "k").alias("custkey"),
        F.when(F.col("c_custkey").isNull(), "order_only")
        .when(F.col("k").isNull(), "customer_only")
        .otherwise("both")
        .alias("side"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


@register(
    "q_right_outer_join",
    oracle="""
SELECT n_name, count(s_suppkey) AS n_suppliers
FROM supplier RIGHT OUTER JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
    tags=("join-right-outer",),
)
def q_right_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    return (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey, "right_outer")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


_NOT_IN_SQL = """
SELECT
  (SELECT count(*) FROM orders
   WHERE o_custkey NOT IN (SELECT nullif(c_custkey, 5) FROM customer
                           WHERE c_custkey < 10)) AS n_with_null_list,
  (SELECT count(*) FROM orders
   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                           WHERE c_custkey < 10 AND c_custkey <> 5)) AS n_clean_list
"""


@register("q_not_in_null_semantics", oracle=_NOT_IN_SQL, tags=("subquery-not-in",))
def q_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI three-valued NOT IN: one NULL in the list empties the
    result; both engines must agree on both variants."""
    views(spark, sf_dir, "orders", "customer")
    return spark.sql(_NOT_IN_SQL)


@register(
    "q_relational_division",
    oracle="""
SELECT c_custkey FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM (SELECT DISTINCT o_orderpriority AS p FROM orders) all_p
  WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = all_p.p
  )
)
""",
    tags=("division", "subquery"),
)
def q_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division (customers who ordered in ALL priority
    classes). The oracle states it as doubly-nested NOT EXISTS; the
    Spark plan is the scalable formulation — count-distinct per key
    compared to the global distinct count (two hash aggs, no nested
    correlation)."""
    orders = t(spark, sf_dir, "orders")
    total = orders.select(
        F.countDistinct("o_orderpriority").alias("__total")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("__n")
    )
    return (
        per_cust.crossJoin(F.broadcast(total))
        .filter(F.col("__n") == F.col("__total"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )


_FILTER_CLAUSE_SQL = """
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
       round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 2)
         AS urgent_total,
       count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '1998-01-01') AS n_recent,
       count(*) AS n_all
FROM orders
GROUP BY o_orderstatus
"""


@register("q_filter_clause_agg", oracle=_FILTER_CLAUSE_SQL, tags=("agg-filter",))
def q_filter_clause_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER (WHERE ...) aggregate modifier — identical SQL text
    runs on both engines."""
    views(spark, sf_dir, "orders")
    return spark.sql(_FILTER_CLAUSE_SQL)


@register(
    "q8_market_share",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       round(sum(CASE WHEN r_name = 'ASIA'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS asia_share
FROM lineitem, orders, customer, nation, region
WHERE l_orderkey = o_orderkey
  AND o_custkey = c_custkey
  AND c_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
GROUP BY yr
""",
    tags=("join", "agg", "case"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: conditional revenue share per year across a
    5-way join; region/nation/customer broadcast, lineitem⋈orders is
    the only shuffle join."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    cnr = F.broadcast(
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cnr, orders.o_custkey == cnr.c_custkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            F.round(
                F.sum(F.when(F.col("r_name") == "ASIA", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("asia_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity) * 10000) AS BIGINT))
            AS BIGINT) AS profit_e4
FROM part, supplier, lineitem, orders, nation
WHERE s_suppkey = l_suppkey
  AND p_partkey = l_partkey
  AND o_orderkey = l_orderkey
  AND s_nationkey = n_nationkey
  AND p_name LIKE '%ol%'
GROUP BY n_name, yr
""",
    tags=("join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by nation-year (supply cost synthesized
    from retail price — the corpus has no partsupp table)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%ol%"))
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    sn = F.broadcast(
        supp.join(nation, supp.s_nationkey == nation.n_nationkey).select(
            "s_suppkey", "n_name"
        )
    )
    # each addend lies on the 1e-4 decimal grid (2-dec prices × 2-dec
    # rates); rounding the ADDEND to integer e4-units before summing
    # makes the aggregate exact integer math — immune to the
    # sum-order ulp divergence that float sums of ±terms accumulate
    # (observed: one group off by one cent at sf0.1 without this)
    profit_e4 = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 10000
    ).cast("long")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sn, li.l_suppkey == sn.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("yr"))
        .agg(F.sum(profit_e4).cast("long").alias("profit_e4"))
    )


# ---------------------------------------------------------------------------
# DISTINCT ON (PG-specific keep-first-per-group): latest order per
# customer. Spark has no DISTINCT ON; the canonical translation is a
# row_number() window with the same ORDER BY — one shuffle on the
# group key, no self-join.
# ---------------------------------------------------------------------------


@register(
    "q_distinct_on",
    oracle="""
SELECT DISTINCT ON (o_custkey)
       o_custkey, o_orderkey AS latest_orderkey,
       round(o_totalprice, 2) AS price
FROM orders
WHERE o_custkey <= 500
ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
""",
    tags=("distinct-on", "window"),
)
def q_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    )
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 500)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.round("o_totalprice", 2).alias("price"),
        )
    )
