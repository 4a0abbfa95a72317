"""Bucketed tables — shuffle-free co-located joins.

The core 100 TB join strategy for repeatedly-joined fact tables:
pre-shuffle both sides into the same bucket layout once at write time
(``bucketBy`` on the join key), and every subsequent equi-join on that
key runs with ZERO exchange — each task joins bucket i of A with
bucket i of B. The reference has no analog (PG would re-hash per
query); in Iceberg terms this is the bucket partition transform.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a managed bucketed table. ``sort_cols`` additionally
    sorts within buckets so downstream sort-merge joins skip the sort."""
    if mode == "overwrite":
        # the session catalog is in-memory: a table dir can outlive its
        # catalog entry across sessions — clear both before writing
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
        if warehouse and os.path.exists(loc):
            shutil.rmtree(loc)
    writer = (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.

    When both sides were written with the same num_buckets on ``on``,
    the plan contains no Exchange (verify with
    plans.shuffle_exchange_count == 0)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
