"""Source/sink formats: round-trips, partitioned writes, pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pg_lakehouse_spark import sources
from pg_lakehouse_spark.sources import FormatUnavailable
from pg_lakehouse_spark.tables import table


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return table(spark, sf_dir, "orders").limit(1000)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip(fmt, orders, spark, tmp_path):
    path = str(tmp_path / f"rt_{fmt}")
    df = orders.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    sources.write(df, path, fmt)
    back = sources.read(spark, path, fmt, schema=df.schema if fmt in ("csv", "json") else None)
    assert back.count() == 1000
    a = df.agg(F.sum("o_orderkey")).collect()[0][0]
    b = back.agg(F.sum("o_orderkey")).collect()[0][0]
    assert a == b


def test_avro_roundtrip_via_sources(orders, spark, tmp_path):
    """Without the spark-avro jar, sources.read/write fall back to the
    pure-Python OCF implementation (avro_io) — same call surface."""
    path = str(tmp_path / "rt_avro")
    df = orders.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    sources.write(df, path, "avro")
    back = sources.read(spark, path, "avro")
    assert back.count() == 1000
    assert dict(back.dtypes) == dict(df.dtypes)
    a = df.agg(F.sum("o_orderkey"), F.sum("o_totalprice")).collect()[0]
    b = back.agg(F.sum("o_orderkey"), F.sum("o_totalprice")).collect()[0]
    assert a[0] == b[0] and abs(a[1] - b[1]) < 1e-6


def test_partitioned_write_prunes(orders, spark, tmp_path):
    path = str(tmp_path / "parts")
    sources.write(orders, path, "parquet", partition_by=["o_orderstatus"])
    # hive-style dirs exist
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(path))
    back = sources.read(spark, path, "parquet").filter(F.col("o_orderstatus") == "O")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at planning, not as a data filter
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan.replace("#", " #").replace(
        "o_orderstatus #", "o_orderstatus#"
    ) or "o_orderstatus" in plan.split("PartitionFilters")[1].split("]")[0]


def test_target_file_rows(orders, spark, tmp_path):
    path = str(tmp_path / "sized")
    sources.write(orders, path, "parquet", target_file_rows=250)
    n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_files == 4


def test_convert_csv_to_parquet(orders, spark, tmp_path):
    csv_path = str(tmp_path / "csv_in")
    pq_path = str(tmp_path / "pq_out")
    df = orders.select("o_orderkey", "o_orderstatus")
    sources.write(df, csv_path, "csv")
    sources.convert(spark, csv_path, pq_path, "csv", "parquet")
    assert sources.read(spark, pq_path, "parquet").count() == 1000
