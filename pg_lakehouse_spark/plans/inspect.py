"""Physical-plan inspection helpers (parse Spark's explain output).

These are the feedback loop for the scale posture: after an operator
is correct, its plan is asserted — filters pushed, columns pruned,
no cartesian products, bounded shuffles — so a regression in plan
shape fails CI even while results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def executed_plan(df: DataFrame) -> str:
    """Simple-mode physical plan string (pre-execution, AQE wrapped)."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filter_columns(df: DataFrame) -> set[str]:
    """Column names appearing in any scan's PushedFilters."""
    plan = formatted_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        for name in re.findall(r"\(([A-Za-z_][A-Za-z0-9_]*)[,)]", m.group(1)):
            cols.add(name)
    return cols


def scan_read_columns(df: DataFrame) -> list[set[str]]:
    """Per-scan set of columns actually read (ReadSchema) — the
    column-pruning check: a scan reading more than the query needs
    wastes I/O proportional to data size."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        body = m.group(1)
        out.append(
            {c.split(":")[0].strip() for c in body.split(",") if ":" in c}
        )
    return out


def has_cartesian_product(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin Cross" in plan


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the plan — each is a
    full data materialization; growth here is the first scale smell."""
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning",
                          executed_plan(df)))
