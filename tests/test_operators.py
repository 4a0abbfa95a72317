"""Operator library: as-of join semantics, bucketed co-located joins,
salted skew joins, top-k helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_lakehouse_spark.operators.bucketing import bucketed_join, write_bucketed
from pg_lakehouse_spark.operators.joins import asof_join
from pg_lakehouse_spark.operators.skew import salted_join
from pg_lakehouse_spark.operators.topk import top_k, top_k_per_group
from pg_lakehouse_spark.plans.inspect import shuffle_exchange_count
from pg_lakehouse_spark.tables import table


def test_asof_join_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c")], "k long, t long, pay string"
    )
    right = spark.createDataFrame(
        [(1, 9, "r1"), (1, 20, "r2"), (1, 25, "r3"), (2, 100, "r4")],
        "rk long, rt long, rpay string",
    )
    back = {
        (r["pay"], r["rpay"])
        for r in asof_join(
            left, right, left_on="t", right_on="rt", left_by="k", right_by="rk"
        ).collect()
    }
    # backward: a→r1 (9<=10), b→r2 (exact tie eligible), c→no match
    assert back == {("a", "r1"), ("b", "r2"), ("c", None)}

    fwd = {
        (r["pay"], r["rpay"])
        for r in asof_join(
            left, right, left_on="t", right_on="rt", left_by="k", right_by="rk",
            direction="forward",
        ).collect()
    }
    # forward: a→r2 (nearest >= 10 is 20), b→r2 (tie), c→r4
    assert fwd == {("a", "r2"), ("b", "r2"), ("c", "r4")}

    tol = {
        (r["pay"], r["rpay"])
        for r in asof_join(
            left, right, left_on="t", right_on="rt", left_by="k", right_by="rk",
            tolerance=F.lit(2),
        ).collect()
    }
    # backward with tolerance 2: a→r1 (gap 1), b→r2 (gap 0), c→None (gap 85)
    assert tol == {("a", "r1"), ("b", "r2"), ("c", None)}


def test_bucketed_join_no_shuffle(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").limit(5000)
    li = table(spark, sf_dir, "lineitem").limit(20000)
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], 8, mode="overwrite"
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], 8, mode="overwrite",
    )
    joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
    assert shuffle_exchange_count(joined) == 0, "bucketed join must not shuffle"
    # same result as a plain join
    plain = orders.join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    )
    assert joined.count() == plain.count()


def test_salted_join_equals_plain_join(spark):
    # synthetic skew: 90% of fact rows share one key
    fact = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dv")
    )
    plain = fact.join(dim, "k")
    salted = salted_join(fact, dim, ["k"], salt_buckets=8)
    assert salted.count() == plain.count()
    a = plain.agg(F.sum(F.col("v") + F.col("dv"))).collect()[0][0]
    b = salted.agg(F.sum(F.col("v") + F.col("dv"))).collect()[0][0]
    assert a == b
    # left join keeps unmatched fact rows
    fact2 = fact.withColumn("k", F.col("k") + 1000)  # no dim match
    lj = salted_join(fact2, dim, ["k"], salt_buckets=4, how="left")
    assert lj.count() == fact2.count()
    assert lj.filter(F.col("dv").isNotNull()).count() == 0


def test_topk_helpers(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    top = top_k(orders, 5, F.desc("o_totalprice"), F.asc("o_orderkey")).collect()
    assert len(top) == 5
    assert top[0]["o_totalprice"] >= top[4]["o_totalprice"]
    per_group = top_k_per_group(
        orders, ["o_orderstatus"], [F.desc("o_totalprice"), F.asc("o_orderkey")], 3
    )
    counts = per_group.groupBy("o_orderstatus").count().collect()
    assert all(r["count"] == 3 for r in counts)


def test_range_join_modes(spark):
    from pg_lakehouse_spark.operators.joins import range_join

    fact = spark.createDataFrame([(5,), (10,), (15,)], "v long")
    ranges = spark.createDataFrame(
        [("lo", 0, 10), ("hi", 10, 20)], "name string, lo long, hi long"
    )
    left_closed = {
        (r["v"], r["name"])
        for r in range_join(fact, ranges, "v", "lo", "hi", closed="left").collect()
    }
    # [lo, hi): 10 belongs to 'hi' only
    assert left_closed == {(5, "lo"), (10, "hi"), (15, "hi")}
    both = {
        (r["v"], r["name"])
        for r in range_join(fact, ranges, "v", "lo", "hi", closed="both").collect()
    }
    # [lo, hi]: 10 belongs to both bands
    assert both == {(5, "lo"), (10, "lo"), (10, "hi"), (15, "hi")}
    outer = range_join(
        spark.createDataFrame([(99,)], "v long"), ranges, "v", "lo", "hi", how="left"
    ).collect()
    assert len(outer) == 1 and outer[0]["name"] is None


def test_fill_gaps_strategies(spark):
    """Gap-fill semantics per strategy: zero, locf, linear (interior
    interpolation + edge fallback), null; is_gap marks synthesized
    rows; every series densifies onto the global grid."""
    from pg_lakehouse_spark.operators.timeseries import (
        delta_per_series,
        fill_gaps,
    )

    rows = [
        ("a", "2024-01-01 00:00:00", 10, 100.0),
        ("a", "2024-01-01 03:00:00", 40, 400.0),
        ("b", "2024-01-01 01:00:00", 7, 70.0),
    ]
    df = spark.createDataFrame(
        rows, "s string, t string, n long, g double"
    ).withColumn("t", F.to_timestamp("t"))
    out = fill_gaps(
        df, "t", "1 HOUR", ["s"],
        {"n": "zero", "g": "linear"},
    ).orderBy("s", "t")
    got = [
        (r.s, r.t.hour, r.n, r.g, r.is_gap) for r in out.collect()
    ]
    # grid is global 00:00..03:00 for BOTH series
    assert [(g[0], g[1]) for g in got] == [
        ("a", 0), ("a", 1), ("a", 2), ("a", 3),
        ("b", 0), ("b", 1), ("b", 2), ("b", 3),
    ]
    a = [g for g in got if g[0] == "a"]
    assert [g[2] for g in a] == [10, 0, 0, 40]          # zero fill
    assert [g[3] for g in a] == [100.0, 200.0, 300.0, 400.0]  # linear
    assert [g[4] for g in a] == [False, True, True, False]
    b = [g for g in got if g[0] == "b"]
    # edges: before first obs -> next value; after last -> prev value
    assert [g[3] for g in b] == [70.0, 70.0, 70.0, 70.0]
    assert [g[2] for g in b] == [0, 7, 0, 0]
    # unknown strategy rejected; unknown column rejected
    with pytest.raises(ValueError, match="unknown fill"):
        fill_gaps(df, "t", "1 HOUR", ["s"], {"n": "wat"})
    with pytest.raises(ValueError, match="not in frame"):
        fill_gaps(df, "t", "1 HOUR", ["s"], {"nope": "zero"})
    # counter deltas
    d = delta_per_series(df, "t", "n", ["s"]).orderBy("s", "t").collect()
    assert [r.delta for r in d] == [None, 30, None]
