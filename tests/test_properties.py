"""Property-based differential tests (hypothesis): random inputs,
independent reference implementations.

Spark jobs are slow per example, so examples are few but each carries
dozens of rows — the composed operators (as-of join, exact dedup) are
where a hand-picked fixture can miss an edge (duplicate timestamps,
all-null groups, keys present on one side only).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from pg_lakehouse_spark.llm.dedup import dedup_exact
from pg_lakehouse_spark.operators.joins import asof_join

_EXAMPLES = 8

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),     # key
        st.integers(min_value=0, max_value=50),    # time
        st.integers(min_value=0, max_value=999),   # payload tag
    ),
    min_size=1,
    max_size=25,
)


@pytest.mark.slow
@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left_rows=rows_strategy, right_rows=rows_strategy)
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows):
    """Backward as-of join ≡ pandas.merge_asof (the de-facto reference
    semantics), modulo our deterministic tie-break on equal right
    times (greatest tiebreak id wins — pandas keeps the LAST row, so
    feed pandas data sorted by (time, tag) and semantics align)."""
    left = spark.createDataFrame(
        [(k, t, f"L{i}") for i, (k, t, _) in enumerate(left_rows)],
        "k long, t long, lpay string",
    )
    # unique (key, time, tag) rows so the tie-break is well-defined
    right_uniq = sorted({(k, t, g) for k, t, g in right_rows})
    right = spark.createDataFrame(
        [(k, t, g) for (k, t, g) in right_uniq],
        "rk long, rt long, rtag long",
    )
    got = {
        (r["k"], r["t"], r["lpay"]): r["rtag"]
        for r in asof_join(
            left, right, left_on="t", right_on="rt",
            left_by="k", right_by="rk", right_tiebreak="rtag",
        ).collect()
    }

    lpdf = pd.DataFrame(
        [(k, t, f"L{i}") for i, (k, t, _) in enumerate(left_rows)],
        columns=["k", "t", "lpay"],
    ).sort_values("t", kind="stable")
    rpdf = pd.DataFrame(right_uniq, columns=["rk", "rt", "rtag"]).sort_values(
        ["rt", "rtag"], kind="stable"
    )
    merged = pd.merge_asof(
        lpdf, rpdf, left_on="t", right_on="rt",
        left_by="k", right_by="rk", direction="backward",
    )
    expect = {
        (r.k, r.t, r.lpay): (None if pd.isna(r.rtag) else int(r.rtag))
        for r in merged.itertuples()
    }
    assert got == expect


@pytest.mark.slow
@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_dedup_exact_keeps_min_id_per_key(spark, rows):
    df = spark.createDataFrame(
        [(i, k, f"p{g}") for i, (k, _, g) in enumerate(rows)],
        "doc_id long, key long, pay string",
    )
    out = dedup_exact(df, F.col("key"), id_col="doc_id").collect()
    # one survivor per distinct key, and it is the min doc_id
    expect = {}
    for i, (k, _, g) in enumerate(rows):
        if k not in expect or i < expect[k][0]:
            expect[k] = (i, f"p{g}")
    assert {(r["key"], r["doc_id"], r["pay"]) for r in out} == {
        (k, i, p) for k, (i, p) in expect.items()
    }
