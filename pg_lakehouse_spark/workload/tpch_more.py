"""Remaining TPC-H query shapes, adapted to the fixture schema.

Completes the Tier-B relational surface (SURVEY.md §2: the reference
delivers all of these through the PG executor over iceberg_am tables,
iceberg_am.c:455-518) with the TPC-H shapes not yet in core.py:
q2, q7, q11, q12, q15, q16, q19, q20, q21, q22 — with q15 this
completes all 22 TPC-H query shapes.

The corpus has no partsupp table and lineitem lacks
shipmode/commitdate/receiptdate, customer lacks phone — so each query
keeps the *plan shape* of its TPC-H namesake (correlated min subquery,
nation-pair self-join, scalar-aggregate threshold, EXISTS/NOT-EXISTS
self-joins, substring country codes) over the columns that exist:

- q2  : supply relation derived as distinct (l_partkey, l_suppkey)
        with unit_cost = min(l_extendedprice / l_quantity).
- q11 : "stock value" per part from lineitem revenue in two nations.
- q12 : late shipment = l_shipdate > o_orderdate + 30 days;
        l_linestatus stands in for l_shipmode.
- q21 : late = l_shipdate > o_orderdate + 45 days on 'F' orders.
- q22 : country code = last two digits of c_name.

Float discipline (see workload/__init__.py): heavy ± aggregates are
integer-scaled (e2 units) so threshold comparisons are exact integer
math in both engines; unit-cost divisions are bit-identical IEEE ops
on identical inputs, safe to compare and round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_lakehouse_spark.workload import register
from pg_lakehouse_spark.workload.util import t

# ---------------------------------------------------------------------------
# q2: min-cost supplier — correlated MIN subquery (decorrelated in Spark
# as agg + self-join on the same shuffle key; the supplier/nation/region
# dimension stack broadcasts).
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH supply AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT partkey, suppkey, unit_cost, s_name, n_name
  FROM supply, supplier, nation, region
  WHERE s_suppkey = suppkey AND s_nationkey = n_nationkey
    AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
)
SELECT p_partkey, s_name, n_name, round(unit_cost, 2) AS unit_cost
FROM part, eu
WHERE p_partkey = partkey AND p_size = 15
  AND unit_cost = (SELECT min(unit_cost) FROM eu e2 WHERE e2.partkey = p_partkey)
""",
    tags=("join", "subquery-correlated", "agg"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") == 15)

    supply = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    sn = F.broadcast(
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    eu = supply.join(sn, supply.suppkey == sn.s_suppkey)
    min_per_part = eu.groupBy("partkey").agg(F.min("unit_cost").alias("__min_cost"))
    return (
        eu.join(min_per_part, "partkey")
        .filter(F.col("unit_cost") == F.col("__min_cost"))
        .join(F.broadcast(part), F.col("partkey") == part.p_partkey)
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            F.round(F.col("unit_cost"), 2).alias("unit_cost"),
        )
    )


# ---------------------------------------------------------------------------
# q7: volume shipping between a nation pair — the two nation dimensions
# attach by broadcast; lineitem⋈orders is the only shuffle join.
# ---------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    oracle="""
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    tags=("join", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    pair = ("NATION_3", "NATION_7")
    sn = F.broadcast(
        t(spark, sf_dir, "supplier")
        .join(
            nation.filter(F.col("n_name").isin(*pair)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cn = F.broadcast(
        t(spark, sf_dir, "customer")
        .join(
            nation.filter(F.col("n_name").isin(*pair)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(sn, li.l_suppkey == sn.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cn, orders.o_custkey == cn.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# q11: important stock — per-key aggregate compared against a scalar
# fraction of the global total. Both sides integer-scaled (e2 units) so
# the threshold comparison is exact integer math: value > total/1000
# ⇔ value_e2 * 1000 > total_e2.
# ---------------------------------------------------------------------------


@register(
    "q11_important_stock",
    oracle="""
WITH stock AS (
  SELECT l_partkey AS partkey,
         sum(CAST(round(l_extendedprice * l_quantity * 100) AS BIGINT)) AS value_e2
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name IN ('NATION_1', 'NATION_2')
  GROUP BY l_partkey
)
SELECT partkey, CAST(value_e2 AS BIGINT) AS value_e2
FROM stock, (SELECT sum(value_e2) AS total_e2 FROM stock) tot
WHERE value_e2 * 1000 > total_e2
""",
    tags=("agg", "subquery", "join"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    sn = F.broadcast(
        t(spark, sf_dir, "supplier")
        .join(
            t(spark, sf_dir, "nation").filter(
                F.col("n_name").isin("NATION_1", "NATION_2")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    stock = (
        li.join(sn, li.l_suppkey == sn.s_suppkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_quantity") * 100).cast(
                    "long"
                )
            ).alias("value_e2")
        )
    )
    total = stock.agg(F.sum("value_e2").alias("total_e2"))
    return (
        stock.crossJoin(F.broadcast(total))
        .filter(F.col("value_e2") * 1000 > F.col("total_e2"))
        .select("partkey", "value_e2")
    )


# ---------------------------------------------------------------------------
# q12: late shipments by line status — join + dual conditional counts
# (CASE inside SUM). "Late" = shipped >30 days after order date.
# ---------------------------------------------------------------------------


@register(
    "q12_late_shipments",
    oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY l_linestatus
""",
    tags=("join", "agg", "case"),
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q15: top supplier — the TPC-H revenue view + max-equality scalar
# subquery. Revenue is a heavy sum of ± product addends, so each addend
# is rounded to the cent grid and integer-summed (workload/__init__.py
# escalation rule); the max-equality compare is then exact integer math
# in both engines. The revenue agg shuffles once on l_suppkey; the max
# is a broadcast scalar; supplier is a broadcast dim.
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS total_revenue_e2
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue_e2 AS BIGINT) AS total_revenue_e2
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue_e2 = (SELECT max(total_revenue_e2) FROM revenue)
""",
    tags=("subquery", "agg", "join"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
        ).alias("total_revenue_e2")
    )
    max_rev = revenue.agg(F.max("total_revenue_e2").alias("__max_rev"))
    supp = F.broadcast(
        t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue_e2") == F.col("__max_rev"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_e2")
    )


# ---------------------------------------------------------------------------
# q16: supplier-part relationship counts — distinct supply pairs, a
# NOT-IN exclusion list (broadcast anti join), multi-column group-by
# with count(DISTINCT).
# ---------------------------------------------------------------------------


@register(
    "q16_parts_supplier_counts",
    oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem) sp
JOIN part ON p_partkey = partkey
WHERE p_brand <> 'Brand#3'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    tags=("join-anti", "agg-distinct"),
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .distinct()
    )
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        pairs.join(F.broadcast(bad_supp), pairs.suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), pairs.partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q19: discounted revenue — a disjunction of brand/size/quantity
# conjuncts. One broadcast join; the OR-of-ANDs stays a single codegen
# filter (no union-of-scans rewrite needed).
# ---------------------------------------------------------------------------


@register(
    "q19_discounted_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 1 AND 21)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        AND l_quantity BETWEEN 10 AND 30)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        AND l_quantity BETWEEN 20 AND 40))
""",
    tags=("join", "filter", "agg"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q20: dominant suppliers (>10% of a part's supplied quantity) —
# nested per-(part,supplier) aggregate compared to the per-part total
# (exact: integral quantities, integer factor), feeding a semi join on
# supplier. Both aggs shuffle on partkey → single exchange reused.
# ---------------------------------------------------------------------------


@register(
    "q20_dominant_suppliers",
    oracle="""
WITH per AS (
  SELECT l_suppkey AS suppkey, l_partkey AS partkey, sum(l_quantity) AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%ol%'
  GROUP BY l_suppkey, l_partkey
),
tot AS (SELECT partkey, sum(qty) AS total_qty FROM per GROUP BY partkey)
SELECT s_suppkey, s_name, n_name
FROM supplier, nation
WHERE s_nationkey = n_nationkey
  AND s_suppkey IN (SELECT suppkey FROM per, tot
                    WHERE per.partkey = tot.partkey AND qty * 10 > total_qty)
""",
    tags=("join-semi", "subquery", "agg"),
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%ol%"))
    per = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("l_suppkey").alias("suppkey"), F.col("l_partkey").alias("partkey")
        )
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = per.groupBy("partkey").agg(F.sum("qty").alias("total_qty"))
    dominant = (
        per.join(tot, "partkey")
        .filter(F.col("qty") * 10 > F.col("total_qty"))
        .select("suppkey")
    )
    sn = t(spark, sf_dir, "supplier").join(
        F.broadcast(t(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return sn.join(
        dominant, sn.s_suppkey == dominant.suppkey, "left_semi"
    ).select("s_suppkey", "s_name", "n_name")


# ---------------------------------------------------------------------------
# q21: suppliers who kept orders waiting — EXISTS + NOT-EXISTS
# self-joins on lineitem, expressed as left-semi and left-anti joins
# that all shuffle on the same key (l_orderkey), so the three legs
# co-partition. "Late" = shipped >45 days after order date, 'F' orders.
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 45 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 45 DAY)
  AND s_nationkey = n_nationkey
GROUP BY s_name
""",
    tags=("join-semi", "join-anti", "agg"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = F.col("o_orderdate") + F.expr("INTERVAL 45 DAY")
    l1 = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > late
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    l1 = l1.join(
        l2,
        (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
        "left_semi",
    )
    l1 = l1.join(
        l3,
        (F.col("k3") == F.col("l_orderkey"))
        & (F.col("s3") != F.col("l_suppkey"))
        & (F.col("d3") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAY")),
        "left_anti",
    )
    sn = F.broadcast(
        t(spark, sf_dir, "supplier").join(
            t(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        l1.join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# q22: global sales opportunity — substring country code (last two
# digits of c_name), a scalar-average threshold made exact by integer
# cross-multiplication (bal > sum/n ⇔ bal_e2 * n > sum_e2), and a
# NOT-EXISTS anti join against orders ("lapsed": no order since
# 2001-01-01 — every sf0.01 customer has *some* order, so the TPC-H
# no-orders-at-all form would be vacuously empty).
# ---------------------------------------------------------------------------


@register(
    "q22_sales_opportunity",
    oracle="""
WITH pool AS (
  SELECT substr(c_name, 17, 2) AS cntrycode, c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_e2
  FROM customer
  WHERE substr(c_name, 17, 2) IN ('01', '13', '21', '29', '30', '31', '32')
),
stats AS (
  SELECT CAST(sum(bal_e2) AS BIGINT) AS s, count(*) AS n
  FROM pool WHERE bal_e2 > 0
)
SELECT cntrycode, count(*) AS numcust, CAST(sum(bal_e2) AS BIGINT) AS totbal_e2
FROM pool, stats
WHERE bal_e2 * n > s
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = pool.c_custkey
                  AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY cntrycode
""",
    tags=("join-anti", "subquery", "agg"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = ("01", "13", "21", "29", "30", "31", "32")
    pool = (
        t(spark, sf_dir, "customer")
        .select(
            F.substring("c_name", 17, 2).alias("cntrycode"),
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_e2"),
        )
        .filter(F.col("cntrycode").isin(*codes))
    )
    stats = pool.filter(F.col("bal_e2") > 0).agg(
        F.sum("bal_e2").alias("s"), F.count(F.lit(1)).alias("n")
    )
    recent_orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(stats))
        .filter(F.col("bal_e2") * F.col("n") > F.col("s"))
        .join(recent_orders, pool.c_custkey == recent_orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_e2").alias("totbal_e2"),
        )
    )
