"""Shared helpers for workload queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pg_lakehouse_spark.tables import table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


def views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register corpus tables as temp views for spark.sql queries."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
