"""Join compositions Spark lacks natively: as-of and range joins.

Reference parity: SURVEY.md §2 Tier B "Joins: range/as-of" — the
reference would serve these through the PG executor (merge/nested-loop
plans); Spark has no ASOF JOIN operator, so we compose one.

Scale notes
-----------
The naive as-of plan (equi-join on key + ``right.ts <= left.ts`` filter
+ rank) explodes: a key with R right rows and L left rows materializes
R×L pairs before ranking. The union+window composition below is the
standard scalable formulation: one shuffle on the key, one in-partition
sort, zero row explosion — O((L+R) log(L+R)) per key, robust to keys
with millions of events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_K, _T, _SIDE, _TB, _L, _R = "__k", "__t", "__side", "__tb", "__lpay", "__rpay"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    tolerance: Column | None = None,
    right_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the nearest right row per key.

    ``backward``: right rows with ``right_on <= left_on``; the match is
    the one with the greatest ``right_on`` (ties broken by the greatest
    ``right_tiebreak``). ``forward`` mirrors this (>=, smallest).
    Left rows with no match keep NULL right columns (left-outer
    semantics). ``tolerance`` (a Column, e.g. ``F.expr("INTERVAL 30
    MINUTES")``) drops matches farther than that from ``left_on``.

    Implementation: tag both sides, union, and run a single
    partition-by-key window where ``last(right_payload, ignorenulls)``
    (or ``first`` for forward) carries the nearest right row onto each
    left row. The right payload travels as one non-null struct so a
    legitimately-NULL right column can never cause the window to skip
    back to an older row.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    backward = direction == "backward"

    rpay_cols = [c for c in right.columns if c != right_by]
    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    # Right rows sort before equal-ts left rows for backward (so <= ties
    # are eligible), after them for forward.
    r_side = 0 if backward else 2
    r2 = right.select(
        F.col(right_by).alias(_K),
        F.col(right_on).alias(_T),
        F.lit(r_side).alias(_SIDE),
        tb.alias(_TB),
        F.lit(None).alias(_L),
        F.struct(*rpay_cols).alias(_R),
    )
    l2 = left.select(
        F.col(left_by).alias(_K),
        F.col(left_on).alias(_T),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r2.schema[_TB].dataType).alias(_TB),
        F.struct(*left.columns).alias(_L),
        F.lit(None).cast(r2.schema[_R].dataType).alias(_R),
    )
    unioned = r2.unionByName(l2)

    order = [F.col(_T).asc(), F.col(_SIDE).asc(), F.col(_TB).asc()]
    w = Window.partitionBy(_K).orderBy(*order)
    if backward:
        frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        matched = F.last(_R, ignorenulls=True).over(frame)
    else:
        frame = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        matched = F.first(_R, ignorenulls=True).over(frame)

    out = unioned.withColumn("__m", matched).filter(F.col(_SIDE) == 1)

    if tolerance is not None:
        m_t = F.col(f"__m.{right_on}")
        in_tol = (
            (m_t >= F.col(_T) - tolerance)
            if backward
            else (m_t <= F.col(_T) + tolerance)
        )
        out = out.withColumn(
            "__m", F.when(in_tol, F.col("__m")).otherwise(F.lit(None))
        )

    proj = [F.col(f"{_L}.{c}").alias(c) for c in left.columns] + [
        F.col(f"__m.{c}").alias(c) for c in rpay_cols
    ]
    return out.select(*proj)


def range_join(
    fact: DataFrame,
    ranges: DataFrame,
    value: str,
    lo: str,
    hi: str,
    how: str = "inner",
    closed: str = "left",
) -> DataFrame:
    """Join fact rows to interval rows: ``lo <= value < hi`` (default).

    The ranges side is broadcast — interval/dimension tables don't grow
    with fact data, so a broadcast nested-loop is the correct plan at
    any scale. For two *large* range sides, pre-bin both sides to a
    common grid and equi-join on the bin instead (see llm.similarity
    for the binning pattern).
    """
    lo_cmp = F.col(value) >= F.col(lo) if closed in ("left", "both") else F.col(value) > F.col(lo)
    hi_cmp = F.col(value) <= F.col(hi) if closed in ("right", "both") else F.col(value) < F.col(hi)
    return fact.join(F.broadcast(ranges), lo_cmp & hi_cmp, how)
