"""Top-k operators.

Global top-k: ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject
(per-partition bounded heap, driver merges k×partitions rows; never a
full sort). Per-group top-k: row_number over a partitioned window —
one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Global top-k. Pass fully deterministic ordering (unique tiebreak)."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group via row_number (dense output, no explosion)."""
    w = Window.partitionBy(*group).orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)
