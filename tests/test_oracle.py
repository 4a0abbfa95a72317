"""Differential tests: every oracle-backed workload query vs DuckDB.

This mirrors the driver's t2 correctness gate (CORRECTNESS_r{N}.json):
row count + schema + order-insensitive values at sf0.01."""

from __future__ import annotations

import pytest

from pg_lakehouse_spark.workload import REGISTRY, _load_all
from tests.oracle_utils import assert_matches_oracle

_load_all()

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    ddf = duck.execute(spec.oracle).df()
    assert_matches_oracle(sdf, ddf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(name, spark, sf_dir):
    spec = REGISTRY[name]
    out = spec.fn(spark, sf_dir)
    assert out.count() >= 0
    assert len(out.schema.fields) > 0
