"""PG-compatibility function kit unit tests (the oracle query
q_pg_function_kit covers the SQL-parity surface; these cover edges)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_lakehouse_spark.functions import pg


def test_split_part_out_of_range(spark):
    df = spark.createDataFrame([("a-b-c",), ("xyz",)], "s string")
    out = df.select(
        pg.split_part(F.col("s"), "-", 2).alias("p2"),
        pg.split_part(F.col("s"), "-", 9).alias("p9"),
    ).collect()
    assert (out[0]["p2"], out[0]["p9"]) == ("b", "")
    assert (out[1]["p2"], out[1]["p9"]) == ("", "")


def test_split_part_regex_metachar_delim(spark):
    df = spark.createDataFrame([("a.b.c",)], "s string")
    assert df.select(pg.split_part(F.col("s"), ".", 2)).collect()[0][0] == "b"


def test_strpos_and_position(spark):
    df = spark.createDataFrame([("hello",)], "s string")
    row = df.select(
        pg.strpos(F.col("s"), "ll").alias("a"),
        pg.strpos(F.col("s"), "zz").alias("b"),
        pg.position("o", F.col("s")).alias("c"),
    ).collect()[0]
    assert (row["a"], row["b"], row["c"]) == (3, 0, 5)


def test_substr_left_right(spark):
    df = spark.createDataFrame([("abcdef",)], "s string")
    row = df.select(
        pg.substr(F.col("s"), 2, 3).alias("m"),
        pg.substr(F.col("s"), 4).alias("tail"),
        pg.left_(F.col("s"), 2).alias("l"),
        pg.right_(F.col("s"), 2).alias("r"),
    ).collect()[0]
    assert (row["m"], row["tail"], row["l"], row["r"]) == ("bcd", "def", "ab", "ef")


def test_date_part_dow_pg_convention(spark):
    # 2024-01-07 is a Sunday → PG dow = 0
    df = spark.createDataFrame([("2024-01-07",)], "d string").select(
        F.col("d").cast("timestamp").alias("ts")
    )
    assert df.select(pg.date_part("dow", F.col("ts"))).collect()[0][0] == 0
    with pytest.raises(ValueError, match="unsupported date_part"):
        pg.date_part("century", F.col("ts"))


def test_string_agg_deterministic_order(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (1, "c"), (2, "z")], "k long, v string"
    )
    out = {
        r["k"]: r["agg"]
        for r in df.groupBy("k")
        .agg(pg.string_agg(F.col("v"), ",", order=[F.col("v")]).alias("agg"))
        .collect()
    }
    assert out == {1: "a,b,c", 2: "z"}


def test_width_bucket_edges(spark):
    from pg_lakehouse_spark.functions import pg

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (4.9,), (5.0,), (9.9,), (10.0,), (42.0,)],
        "x double",
    )
    got = [
        r.b
        for r in df.select(
            pg.width_bucket(F.col("x"), 0.0, 10.0, 2).alias("b")
        ).collect()
    ]
    # PG: below range -> 0, at/above high -> n+1, else 1-based bucket
    assert got == [0, 1, 1, 2, 2, 3, 3]


def test_btrim_quote_format(spark):
    from pg_lakehouse_spark.functions import pg

    df = spark.createDataFrame([("xxhello worldxy", 'a"b', "it's")], "s string, i string, l string")
    r = df.select(
        pg.btrim(F.col("s"), "xy").alias("t"),
        pg.btrim(F.lit("  pad  ")).alias("ws"),
        pg.quote_ident(F.col("i")).alias("qi"),
        pg.quote_literal(F.col("l")).alias("ql"),
        pg.format_pg("%s=%s", F.lit("k"), F.lit("v")).alias("f"),
    ).collect()[0]
    assert r.t == "hello world"
    assert r.ws == "pad"
    assert r.qi == '"a""b"'
    assert r.ql == "'it''s'"
    assert r.f == "k=v"


def test_array_agg_and_percentile_disc(spark):
    from pg_lakehouse_spark.functions import pg

    df = spark.createDataFrame(
        [("g", 3.0), ("g", 1.0), ("g", 2.0), ("h", 5.0)], "k string, v double"
    )
    rows = {
        r.k: (r.arr, r.p50, r.p50c)
        for r in df.groupBy("k")
        .agg(
            pg.array_agg(F.col("v")).alias("arr"),
            pg.percentile_disc(F.col("v"), 0.5).alias("p50"),
            pg.percentile_cont(F.col("v"), 0.5).alias("p50c"),
        )
        .collect()
    }
    assert rows["g"] == ([1.0, 2.0, 3.0], 2.0, 2.0)
    # discrete percentile returns an ACTUAL value; continuous interpolates
    df2 = spark.createDataFrame([("g", 1.0), ("g", 2.0)], "k string, v double")
    r2 = df2.groupBy("k").agg(
        pg.percentile_disc(F.col("v"), 0.5).alias("d"),
        pg.percentile_cont(F.col("v"), 0.5).alias("c"),
    ).collect()[0]
    assert r2.d == 1.0 and r2.c == 1.5
