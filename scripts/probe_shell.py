"""Interactive probe shell for round batteries.

Usage: python -i scripts/probe_shell.py
Provides: spark, lsql, q(sql) -> list of tuples, d(sql) -> DuckDB rows.
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pg_lakehouse_spark import get_spark  # noqa: E402
from pg_lakehouse_spark.lakehouse import LakeCatalog  # noqa: E402
from pg_lakehouse_spark.sql import LakeSQL  # noqa: E402

spark = get_spark("probe", cpus=4, shuffle_partitions=4)
_wh = tempfile.mkdtemp(prefix="probe_wh_")
lsql = LakeSQL(spark, LakeCatalog(spark, _wh))
duck = duckdb.connect()


def q(sql: str):
    return [tuple(r) for r in lsql.sql(sql).collect()]


def d(sql: str):
    return duck.execute(sql).fetchall()


print("ready: q(sql) -> engine rows, d(sql) -> duckdb rows")
