"""Relational operator library (SURVEY.md §2 Tier B).

Most Tier-B operators are direct Spark primitives; this package holds
the compositions Spark lacks natively (as-of join, range join, per-group
top-k, sessionization) plus thin, tested wrappers that encode the
scale-correct strategy (broadcast hints, salt-for-skew).
"""

from pg_lakehouse_spark.operators.bucketing import bucketed_join, write_bucketed
from pg_lakehouse_spark.operators.joins import asof_join, range_join
from pg_lakehouse_spark.operators.skew import salted_join
from pg_lakehouse_spark.operators.timeseries import (
    delta_per_series,
    fill_gaps,
    sessionize,
)
from pg_lakehouse_spark.operators.topk import top_k, top_k_per_group

__all__ = [
    "asof_join",
    "range_join",
    "top_k",
    "top_k_per_group",
    "bucketed_join",
    "write_bucketed",
    "salted_join",
    "fill_gaps",
    "delta_per_series",
    "sessionize",
]
