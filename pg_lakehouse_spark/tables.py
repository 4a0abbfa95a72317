"""Fixture-table registry over parquet directories.

Spark-first equivalent of the reference's catalog open/load path
(reference operations/table_ops.c:279-335, catalog/pg_catalog.cpp:334-357):
resolve a table name to a DataFrame. Here the "catalog" is a directory of
parquet files (the driver corpus, TESTDATA.md); managed snapshot-versioned
tables live in :mod:`pg_lakehouse_spark.lakehouse`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _restore_nanos_timestamps(df: DataFrame) -> DataFrame:
    """The corpus stores some timestamps as TIMESTAMP(NANOS), which the
    session reads as int64 nanos (``nanosAsLong``). Restore timestamp
    type via integer division — double division would lose precision at
    1.7e18 ns magnitudes."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    for field in df.schema.fields:
        if isinstance(field.dataType, LongType) and field.name in ("ts",):
            df = df.withColumn(
                field.name, F.timestamp_micros(F.expr(f"{field.name} div 1000"))
            )
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table. Column pruning / predicate pushdown reach
    the parquet scan because this is a plain declarative read.

    Works on ANY session, not just ours: the TIMESTAMP(NANOS) conf is
    set at runtime here because the driver's verify harness passes its
    own SparkSession, which won't carry our session-factory config.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # AQE is safe on any session and keeps a default-200-partition
        # caller from paying empty-task overhead at small SFs
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    except Exception:
        pass  # conf locked down → the session must already handle nanos
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _restore_nanos_timestamps(df)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, register: bool = True
) -> dict[str, DataFrame]:
    """Load every corpus table; optionally register temp views so
    ``spark.sql`` queries can refer to them by name."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        out[name] = df
        if register:
            df.createOrReplaceTempView(name)
    return out
