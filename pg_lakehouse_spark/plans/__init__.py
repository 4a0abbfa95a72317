"""Plan inspection + scale linting.

SURVEY.md §7: "encode scale rules (no driver-side collects, no
unbounded collect_list, partition-count heuristics) as lint-style
tests rather than claims." This package provides the inspection
primitives; tests/test_plans.py applies them to every workload query.
"""

from pg_lakehouse_spark.plans.inspect import (
    executed_plan,
    formatted_plan,
    has_cartesian_product,
    pushed_filter_columns,
    scan_read_columns,
    shuffle_exchange_count,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "has_cartesian_product",
    "pushed_filter_columns",
    "scan_read_columns",
    "shuffle_exchange_count",
]
