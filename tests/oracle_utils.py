"""Differential-test utilities: Spark result vs DuckDB oracle.

Mirrors the driver's CORRECTNESS check: row count + column names +
order-insensitive value comparison (columns sorted by name)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return None
        return round(f, 9)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_value(x) for x in v)
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [
        tuple(_norm_value(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def assert_matches_oracle(spark_df, duck_df: pd.DataFrame, name: str = "") -> None:
    spark_pd = spark_df.toPandas()
    assert sorted(spark_pd.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_pd.columns)} "
        f"duck={sorted(duck_df.columns)}"
    )
    assert len(spark_pd) == len(duck_df), (
        f"{name}: row count mismatch spark={len(spark_pd)} duck={len(duck_df)}"
    )
    s_rows, d_rows = normalize(spark_pd), normalize(duck_df)
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"{name}: first differing row #{i}:\n spark={a}\n duck ={b}"
