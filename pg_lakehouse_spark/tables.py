"""Fixture-table registry over parquet directories.

Spark-first equivalent of the reference's catalog open/load path
(reference operations/table_ops.c:279-335, catalog/pg_catalog.cpp:334-357):
resolve a table name to a DataFrame. Here the "catalog" is a directory of
parquet files (the driver corpus, TESTDATA.md); managed snapshot-versioned
tables live in :mod:`pg_lakehouse_spark.lakehouse`.
"""

from __future__ import annotations

import os
import weakref

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
    """Normalize ``ts`` to canonical TIMESTAMP whatever encoding the
    (driver-regenerated) fixture used: int64 epoch-nanos
    (``nanosAsLong`` legacy read), µs TIMESTAMP_NTZ, or µs TIMESTAMP.
    See :mod:`pg_lakehouse_spark.timeutil`."""
    from pg_lakehouse_spark.timeutil import normalize_ts

    return normalize_ts(df, ("ts",))


# session -> {(sf_dir, name) -> DataFrame}. A DataFrame is an immutable
# logical plan, so reuse is safe; this removes the repeated file-listing
# + footer-schema-read (~50-100 ms) and conf RPCs that otherwise tax
# EVERY query construction. Keyed on the session OBJECT via weakref —
# an ``id(spark)`` key could alias a new session after the old one is
# garbage-collected and hand back plans bound to a stopped session.
# Entries die with their session. Fixture dirs are read-only; call
# clear_table_cache() if a path's files are ever replaced in-session.
_TABLE_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def clear_table_cache() -> None:
    _TABLE_CACHE.clear()


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table. Column pruning / predicate pushdown reach
    the parquet scan because this is a plain declarative read.

    Works on ANY session, not just ours: the TIMESTAMP(NANOS) conf is
    set at runtime here because the driver's verify harness passes its
    own SparkSession, which won't carry our session-factory config.
    """
    per_session = _TABLE_CACHE.get(spark)
    if per_session is None:
        per_session = _TABLE_CACHE.setdefault(spark, {})
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            # AQE is safe on any session and keeps a default-200-partition
            # caller from paying empty-task overhead at small SFs
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.enabled", "true"
            )
        except Exception:
            pass  # conf locked down → the session must already handle nanos
    key = (os.path.abspath(sf_dir), name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _restore_nanos_timestamps(df)
    per_session[key] = df
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
        df = table(spark, sf_dir, name)
        out[name] = df
        if register:
            df.createOrReplaceTempView(name)
    return out
