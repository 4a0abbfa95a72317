"""Incremental materialized rollups over lakehouse tables (continuous
aggregates — the "hypertable rollup" pattern from time-series stores,
re-expressed Spark-first).

A rollup is itself a snapshot-versioned lakehouse table whose rows are
partial-aggregate state per (time bucket, group keys). ``refresh``
consumes ONLY the source snapshots committed since the last refresh
(`LakeTable.read_incremental` — the files those snapshots added, never
history), partially aggregates that delta, and MERGEs it into the
stored state. The combine functions are sum-of-sums / add-of-counts /
min-of-mins / max-of-maxes — the same partial-aggregate merge Spark
performs map-side inside every hash aggregate, lifted to table
granularity. Refresh cost therefore scales with NEW data, not table
size: at 100 TB, an hourly refresh reads the hour's files.

The source-version watermark is stamped into the rollup commit's
snapshot summary (``rollup_source_version``), so state and watermark
advance atomically in one commit — a crashed refresh is simply retried
from the old watermark with no double counting.

If any source snapshot since the watermark is NOT a pure append
(delete/update/merge/overwrite invalidate previously aggregated rows),
``refresh`` falls back to a full recompute — the simple form of
continuous-aggregate invalidation handling.

Reference parity: the reference repo has no rollup surface (it is a
storage extension, pg_lakehouse_iceberg/src/iceberg_am.c); this is
north-star Tier-C scope (BASELINE.json) built on the lakehouse layer's
snapshot machinery (A6/A9/A10 in SURVEY.md §2).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pg_lakehouse_spark.timeutil import epoch_us

from pg_lakehouse_spark.lakehouse import (
    LakeCatalog,
    LakehouseError,
    LakeTable,
    Snapshot,
)

BUCKET_COL = "bucket_start"

_UNIT_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def _bucket_width_us(bucket: str) -> int:
    parts = bucket.strip().split()
    if len(parts) == 1:
        n, unit = 1, parts[0]
    elif len(parts) == 2:
        n, unit = int(parts[0]), parts[1]
    else:
        raise LakehouseError(f"bad bucket spec {bucket!r}")
    unit = unit.rstrip("s")
    if unit not in _UNIT_US or n < 1:
        raise LakehouseError(
            f"bad bucket spec {bucket!r}; use e.g. '15 minutes', '1 hour'"
        )
    return n * _UNIT_US[unit]


def time_bucket(col: Column | str, bucket: str) -> Column:
    """Floor a timestamp to the bucket grid (Timescale-style
    ``time_bucket``), as a timestamp. Integer microsecond arithmetic
    (``pmod`` on longs) — exact on bucket boundaries, no double
    round-trip — and pure JVM expressions, so it stays inside
    whole-stage codegen."""
    w = _bucket_width_us(bucket)
    us = epoch_us(col)
    return F.timestamp_micros(us - F.pmod(us, F.lit(w)))


_KINDS = ("sum", "count", "min", "max", "approx_distinct", "approx_topk")

# affected-bucket sets up to this size travel as a literal IN-list
# (exact manifest pruning); above it they'd be a driver-side literal
# bomb (millions of buckets at fine grain), so the scope switches to a
# broadcast semi-join plus a coarse time-range pushdown
_BUCKET_ISIN_CAP = 4096


def _bucket_scope(rollup, source, spec, aff_df):
    """Resolve a frame of affected bucket timestamps (column ``__b``)
    into a source slice and a merge by-source scope — without ever
    collecting the bucket list when it is large.

    ≤ ``_BUCKET_ISIN_CAP`` buckets: literal IN-list, so manifest
    pruning sees the exact bucket values. Above the cap: the slice is
    a broadcast semi-join against the bucket frame, gated by a coarse
    ``[lo, hi + width)`` range on the RAW time column (plain
    comparisons — they reach the parquet scan and the manifest), and
    the merge's by-source delete is scoped to the bucket range —
    correct because ``extend_state`` unions the in-range UNTOUCHED
    rollup rows into the merge source, so they match and self-update
    and only genuinely vanished buckets fall through to the delete
    clause.

    Returns ``(slice_df, by_source_cond, extend_state, n_buckets)``,
    or ``None`` when no bucket is affected.
    """
    bucket_expr = time_bucket(spec["time_col"], spec["bucket"])
    # aff_df feeds the stats agg plus one or two joins; persist so its
    # upstream (a distinct over the change feed or the rollup state)
    # computes once. Callers unpersist after their merge commits.
    aff_df = aff_df.persist()
    stats = aff_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__b").alias("lo"),
        F.max("__b").alias("hi"),
    ).collect()[0]
    n = int(stats["n"])
    if not n:
        aff_df.unpersist()
        return None
    if n <= _BUCKET_ISIN_CAP:
        vals = [r[0] for r in aff_df.collect()]
        aff_df.unpersist()  # literal IN-list: the frame is done
        return (
            source.read().filter(bucket_expr.isin(vals)),
            F.col(BUCKET_COL).isin(vals),
            lambda state: state,
            n,
        )
    lo, hi = stats["lo"], stats["hi"]
    width = _bucket_width_us(spec["bucket"])
    tcol = F.col(spec["time_col"])
    in_range = (tcol >= F.lit(lo)) & (
        epoch_us(tcol) < epoch_us(F.lit(hi)) + F.lit(width)
    )
    slice_df = (
        source.read()
        .filter(in_range)
        .join(
            F.broadcast(aff_df), bucket_expr == F.col("__b"), "left_semi"
        )
    )

    def extend_state(state: DataFrame) -> DataFrame:
        untouched = (
            rollup.read()
            .filter(F.col(BUCKET_COL).between(F.lit(lo), F.lit(hi)))
            .join(
                F.broadcast(aff_df),
                F.col(BUCKET_COL) == F.col("__b"),
                "left_anti",
            )
            .select(*state.columns)
        )
        return state.unionByName(untouched)

    return (
        slice_df,
        F.col(BUCKET_COL).between(F.lit(lo), F.lit(hi)),
        extend_state,
        n,
    )

# state capacity per tracked k: candidate summaries hold CAP_FACTOR×k
# counters so near-boundary items survive merges (space-saving rule of
# thumb); the state column stays a few KB per (bucket, group) row.
_TOPK_CAP_FACTOR = 4


def _topk_truncate_map(m, cap: int):
    """Keep the ``cap`` highest-count entries of a map<string,long> —
    pure expressions (map_entries → sort by count desc → slice →
    map_from_entries), so the summary stays mergeable state that never
    leaves the JVM."""
    # sort key (-count, item) ascending = count desc, item ASC on ties
    # (same tie-break as the partial window, so truncation is
    # deterministic end-to-end)
    ranked = F.sort_array(
        F.transform(
            F.map_entries(m),
            lambda kv: F.struct(
                (-kv["value"]).alias("nv"), kv["key"].alias("k")
            ),
        )
    )
    kept = F.slice(ranked, 1, cap)
    return F.map_from_entries(
        F.transform(kept, lambda s: F.struct(s["k"], -s["nv"]))
    )


def _partial_topk(
    df: DataFrame,
    time_col: str,
    bucket: str,
    group_by: list[str],
    out: str,
    src: str,
    cap: int,
) -> DataFrame:
    """Candidate heavy-hitter summary for a delta: exact counts per
    (bucket, group, item), window-truncated to the top ``cap`` items
    per group BEFORE any collection — bounded state end-to-end even on
    high-cardinality sources (the collect never sees more than ``cap``
    rows per group)."""
    from pyspark.sql.window import Window

    cnt = (
        df.filter(F.col(src).isNotNull())  # NULL is not an item (PG count)
        .groupBy(
            time_bucket(time_col, bucket).alias(BUCKET_COL),
            *group_by,
            F.col(src).cast("string").alias("__item"),
        )
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = Window.partitionBy(BUCKET_COL, *group_by).orderBy(
        F.desc("__c"), F.asc("__item")
    )
    return (
        cnt.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .groupBy(BUCKET_COL, *group_by)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__item", "__c"))
            ).alias(out)
        )
    )


def _partial_agg(
    df: DataFrame,
    time_col: str,
    bucket: str,
    group_by: list[str],
    metrics: dict,
) -> DataFrame:
    aggs = []
    topk = {}
    for out, spec in metrics.items():
        kind, src = spec[0], spec[1]
        if kind == "sum":
            aggs.append(F.sum(src).alias(out))
        elif kind == "count":
            aggs.append(
                F.count(F.lit(1) if src == "*" else F.col(src)).alias(out)
            )
        elif kind == "min":
            aggs.append(F.min(src).alias(out))
        elif kind == "max":
            aggs.append(F.max(src).alias(out))
        elif kind == "approx_distinct":
            # mergeable distinct: the state column is an HLL sketch
            # (binary); sketches union losslessly (register-wise max),
            # so incremental refresh = full recompute EXACTLY — the
            # continuous-aggregate answer to "exact distinct is not
            # mergeable partial state"
            aggs.append(F.hll_sketch_agg(F.col(src)).alias(out))
        elif kind == "approx_topk":
            # mergeable heavy hitters: map<item,count> candidate
            # summary (top CAP_FACTOR×k per group); maps merge by
            # map_zip_with count addition + re-truncation. Exact when
            # per-group cardinality fits the capacity; otherwise a
            # space-saving-style candidate list (counts never
            # overestimated, frequent items retained). A 4th spec
            # element declares a RETRACTION ERROR BUDGET (fraction of
            # the group's count(*)): the metric then also refreshes
            # through DML windows via signed deltas, tracking
            # uncertain retractions in a ``<out>__retr`` companion
            # (see refresh_rollup).
            k = int(spec[2]) if len(spec) > 2 else 10
            topk[out] = (src, _TOPK_CAP_FACTOR * k)
        else:
            raise LakehouseError(
                f"unsupported metric kind {kind!r}; supported: {_KINDS} "
                "(avg = sum/count at query time; exact distinct is not "
                "mergeable — use approx_distinct, an HLL sketch column)"
            )
    out_df = None
    if aggs or not topk:
        out_df = df.groupBy(
            time_bucket(time_col, bucket).alias(BUCKET_COL), *group_by
        ).agg(*aggs)
    for out, (src, cap) in topk.items():
        part = _partial_topk(df, time_col, bucket, group_by, out, src, cap)
        out_df = (
            part
            if out_df is None
            # state-sized join (one row per bucket×group on both sides)
            else out_df.join(part, on=[BUCKET_COL, *group_by], how="full")
        )
    # budgeted topk metrics carry a zeroed retraction-uncertainty
    # companion so fresh state / recomputed buckets start clean
    for out in _budgeted_topk(metrics):
        out_df = out_df.withColumn(
            f"{out}__retr", F.lit(0).cast("long")
        )
    return out_df


def _budgeted_topk(metrics: dict) -> dict[str, float]:
    """{out: budget} for approx_topk metrics declaring a retraction
    error budget (4th spec element, fraction of the group's count(*))."""
    return {
        out: float(m[3])
        for out, m in metrics.items()
        if m[0] == "approx_topk" and len(m) > 3 and m[3] is not None
    }


def create_rollup(
    catalog: LakeCatalog,
    namespace: str,
    name: str,
    source: LakeTable,
    time_col: str,
    bucket: str,
    group_by: list[str],
    metrics: dict,
) -> LakeTable:
    """Create + initially populate a rollup table.

    ``metrics`` maps output column -> (kind, source column), kind in
    {sum, count, min, max}; count accepts "*". The spec is persisted in
    table properties so ``refresh`` needs only the two tables.
    """
    for out in metrics:
        if out == BUCKET_COL or out in group_by:
            raise LakehouseError(f"metric name {out!r} collides with a key")
    state = _partial_agg(source.read(), time_col, bucket, group_by, metrics)
    spec = {
        "time_col": time_col,
        "bucket": bucket,
        "group_by": group_by,
        "metrics": {k: list(v) for k, v in metrics.items()},
    }
    tbl = catalog.create_table(
        namespace, name, state.schema,
        properties={"rollup_spec": json.dumps(spec)},
    )
    tbl.overwrite(
        state,
        summary_extra={"rollup_source_version": source.current_version()},
    )
    return tbl


def _pairwise_merge_exprs(metrics: dict) -> dict:
    """Per-metric merge of an existing state row (``out``) with a
    delta partial row (``__src.out``) — the associative combine every
    incremental path shares: MERGE assignments in ``refresh_rollup``
    and the read-time join in ``read_rollup_realtime``. Null-safe on
    either side (a group present in only one input keeps that side)."""
    updates = {}
    for out, mspec in metrics.items():
        kind = mspec[0]
        tgt, src = F.col(out), F.col(f"__src.{out}")
        if kind == "approx_topk":
            k = int(mspec[2]) if len(mspec) > 2 else 10
            merged = F.map_zip_with(
                tgt,
                src,
                lambda _k, v1, v2: F.coalesce(v1, F.lit(0))
                + F.coalesce(v2, F.lit(0)),
            )
            updates[out] = (
                F.when(tgt.isNull(), src)
                .when(src.isNull(), tgt)
                .otherwise(
                    _topk_truncate_map(merged, _TOPK_CAP_FACTOR * k)
                )
            )
        elif kind in ("sum", "count"):
            # null-safe add: SUM over an all-NULL delta group is
            # NULL and must not poison existing state
            updates[out] = (
                F.when(tgt.isNull(), src)
                .when(src.isNull(), tgt)
                .otherwise(tgt + src)
            )
        elif kind == "min":
            updates[out] = F.least(tgt, src)  # least/greatest skip NULLs
        elif kind == "approx_distinct":
            updates[out] = (
                F.when(tgt.isNull(), src)
                .when(src.isNull(), tgt)
                .otherwise(F.hll_union(tgt, src))
            )
        else:
            updates[out] = F.greatest(tgt, src)
    return updates


def _watermark(rollup: LakeTable) -> int:
    for snap in reversed(rollup.snapshots()):
        v = snap.summary.get("rollup_source_version")
        if v is not None:
            return int(v)
    raise LakehouseError(
        "not a rollup table: no rollup_source_version in any snapshot"
    )


def refresh_rollup(source: LakeTable, rollup: LakeTable) -> Snapshot:
    """Advance the rollup to the source's current snapshot.

    Pure-append source history since the watermark → incremental MERGE
    of the delta's partial aggregates (cost ∝ new data). A window with
    row-level DML still refreshes incrementally via RETRACTION deltas
    (change feed rows weighted ±1) when every metric is sum/count and
    the table serves a change feed. Anything else → full recompute
    (overwrite). Either way the new watermark commits atomically with
    the state.
    """
    spec = json.loads(rollup.snapshot().properties["rollup_spec"])
    metrics = {k: tuple(v) for k, v in spec["metrics"].items()}
    group_by = spec["group_by"]
    last = _watermark(rollup)
    cur = source.current_version()
    if cur <= last:
        return rollup.snapshot()

    # classify via the ref's parent chain, not the numeric range —
    # versions are globally allocated, so the range could interleave
    # other branches' snapshots (which never affect THIS ref's state)
    chain = source._ancestry(cur)
    window = [source.snapshot(v) for v in chain if last < v]
    window_is_complete = last == 0 or last in chain
    if window_is_complete and all(s.operation == "append" for s in window):
        delta = source.read_incremental(last, cur)
        partial = _partial_agg(
            delta, spec["time_col"], spec["bucket"], group_by, metrics
        )
        updates = _pairwise_merge_exprs(metrics)
        return rollup.merge(
            partial,
            on=[BUCKET_COL] + group_by,
            when_matched_update=updates,
            summary_extra={"rollup_source_version": cur},
        )

    # -- retraction IVM: a window containing row-level DML can still
    # refresh incrementally when (a) every metric is retractable — sum/
    # count subtract exactly; approx_topk participates when it declares
    # an ERROR BUDGET (4th spec element): signed candidate-map deltas
    # apply, and retracted mass the truncated map cannot account for
    # accrues in a ``<out>__retr`` companion; once a row's uncertainty
    # exceeds budget × count(*), its bucket recomputes from the source
    # (scoped, same shape as partial invalidation) and the counter
    # resets — bounded error with delta-proportional cost in the steady
    # state; (b) a count(*) metric exists (fully-retracted groups are
    # detectable AND the budget has a denominator), and (c) the source
    # serves a row-level change feed for the window. Deletes/update-
    # preimages enter with weight -1, inserts/postimages with +1.
    budgeted = _budgeted_topk(metrics)
    retractable = all(
        m[0] in ("sum", "count")
        or (m[0] == "approx_topk" and out in budgeted)
        for out, m in metrics.items()
    )
    star_cols = [
        out for out, m in metrics.items()
        if m[0] == "count" and m[1] == "*"
    ]
    dml_ok = all(
        s.operation in ("append", "delete", "update", "merge")
        for s in window
    )
    if window_is_complete and retractable and star_cols and dml_ok:
        try:
            changes = source.read_changes(last, cur)
        except LakehouseError:
            changes = None  # feed off for some DML commit -> recompute
        if changes is not None:
            from pyspark.sql.window import Window as _W

            weight = F.when(
                F.col("_change_type").isin("insert", "update_postimage"),
                F.lit(1),
            ).otherwise(F.lit(-1))
            signed = changes.withColumn("__w", weight)
            bucket_expr = time_bucket(spec["time_col"], spec["bucket"])
            aggs = []
            topk_parts = []
            for out, mspec in metrics.items():
                kind, src = mspec[0], mspec[1]
                if kind == "count":
                    aggs.append(
                        F.sum(
                            F.lit(1) * F.col("__w")
                            if src == "*"
                            else F.when(
                                F.col(src).isNotNull(), F.col("__w")
                            ).otherwise(F.lit(0))
                        ).cast("long").alias(out)
                    )
                elif kind == "sum":
                    aggs.append(F.sum(F.col(src) * F.col("__w")).alias(out))
                else:  # budgeted approx_topk: signed item-count map
                    k = int(mspec[2]) if len(mspec) > 2 else 10
                    cap = _TOPK_CAP_FACTOR * k
                    cnt = (
                        signed.filter(F.col(src).isNotNull())
                        .groupBy(
                            bucket_expr.alias(BUCKET_COL),
                            *group_by,
                            F.col(src).cast("string").alias("__item"),
                        )
                        .agg(F.sum("__w").cast("long").alias("__c"))
                        .filter(F.col("__c") != 0)
                    )
                    # positive candidates truncate like the append path;
                    # NEGATIVE entries all survive — every retraction
                    # must reach the state map (or be counted as error)
                    wr = _W.partitionBy(BUCKET_COL, *group_by).orderBy(
                        F.desc("__c"), F.asc("__item")
                    )
                    pos = (
                        cnt.filter(F.col("__c") > 0)
                        .withColumn("__rn", F.row_number().over(wr))
                        .filter(F.col("__rn") <= cap)
                        .drop("__rn")
                    )
                    keep = pos.unionByName(cnt.filter(F.col("__c") < 0))
                    topk_parts.append(
                        keep.groupBy(BUCKET_COL, *group_by).agg(
                            F.map_from_entries(
                                F.collect_list(F.struct("__item", "__c"))
                            ).alias(out)
                        )
                    )
            partial = signed.groupBy(
                bucket_expr.alias(BUCKET_COL), *group_by
            ).agg(*aggs)
            for part in topk_parts:
                # every changed row feeds count(*), so topk groups are
                # a subset of the sum/count groups — left join aligns
                partial = partial.join(
                    part, on=[BUCKET_COL, *group_by], how="left"
                )
            updates = {}
            insert_vals = {
                c: F.col(f"__src.{c}") for c in [BUCKET_COL, *group_by]
            }
            zero = F.lit(0).cast("long")
            for out, mspec in metrics.items():
                tgt, srcc = F.col(out), F.col(f"__src.{out}")
                if mspec[0] != "approx_topk":
                    updates[out] = (
                        F.when(tgt.isNull(), srcc)
                        .when(srcc.isNull(), tgt)
                        .otherwise(tgt + srcc)
                    )
                    insert_vals[out] = srcc
                    continue
                k = int(mspec[2]) if len(mspec) > 2 else 10
                cap = _TOPK_CAP_FACTOR * k
                rcol = f"{out}__retr"
                merged = F.map_zip_with(
                    tgt, srcc,
                    lambda _k, v1, v2: F.coalesce(v1, F.lit(0))
                    + F.coalesce(v2, F.lit(0)),
                )
                # retracted mass the candidate map cannot cover: items
                # driven negative (absent, or undercounted by earlier
                # truncation) — this is exactly the unaccounted error
                neg_mass = F.aggregate(
                    F.map_values(merged),
                    zero,
                    lambda a, v: a + F.when(v < 0, -v).otherwise(zero),
                )
                cleaned = _topk_truncate_map(
                    F.map_filter(merged, lambda _k, v: v > 0), cap
                )
                pos_only = F.map_filter(srcc, lambda _k, v: v > 0)
                src_neg = F.aggregate(
                    F.map_values(srcc),
                    zero,
                    lambda a, v: a + F.when(v < 0, -v).otherwise(zero),
                )
                updates[out] = (
                    F.when(tgt.isNull() & srcc.isNull(), tgt)
                    .when(tgt.isNull(), pos_only)
                    .when(srcc.isNull(), tgt)
                    .otherwise(cleaned)
                )
                updates[rcol] = (
                    F.coalesce(F.col(rcol), zero)
                    + F.when(srcc.isNull(), zero)
                    .when(tgt.isNull(), src_neg)
                    .otherwise(neg_mass)
                )
                insert_vals[out] = pos_only
                insert_vals[rcol] = F.coalesce(src_neg, zero)
            snap = rollup.merge(
                partial,
                on=[BUCKET_COL] + group_by,
                when_matched_update=updates,
                when_not_matched_values=insert_vals,
                summary_extra={
                    "rollup_source_version": cur,
                    "rollup_refresh": "retraction",
                },
            )
            if not budgeted:
                return snap
            # budget sweep: rows whose accumulated uncertainty exceeds
            # budget × count(*) force a scoped recompute of their
            # BUCKETS (cost ∝ affected buckets' source slice); the
            # recomputed state carries __retr = 0
            star = star_cols[0]
            over_pred = None
            for out, budget in budgeted.items():
                p = F.col(f"{out}__retr") > F.lit(budget) * F.coalesce(
                    F.col(star).cast("double"), F.lit(0.0)
                )
                over_pred = p if over_pred is None else (over_pred | p)
            aff = (
                rollup.read()
                .filter(over_pred)
                .select(F.col(BUCKET_COL).alias("__b"))
                .distinct()
            )
            scope = _bucket_scope(rollup, source, spec, aff)
            if scope is None:
                return snap
            slice_df, by_source_cond, extend_state, n_over = scope
            try:
                state = extend_state(
                    _partial_agg(
                        slice_df, spec["time_col"], spec["bucket"],
                        group_by, metrics,
                    )
                )
                return rollup.merge(
                    state,
                    on=[BUCKET_COL] + group_by,
                    when_matched_update={
                        c: F.col(f"__src.{c}")
                        for c in state.columns
                        if c not in (BUCKET_COL, *group_by)
                    },
                    when_not_matched_insert=True,
                    when_not_matched_by_source_delete=True,
                    when_not_matched_by_source_condition=by_source_cond,
                    summary_extra={
                        "rollup_source_version": cur,
                        "rollup_refresh": "retraction+budget-sweep",
                        "rollup_swept_buckets": n_over,
                    },
                )
            finally:
                aff.unpersist()

    # -- partial invalidation: metrics that can't retract (min/max/
    # sketches) still avoid a FULL recompute when the source serves a
    # change feed — only the BUCKETS the DML touched recompute, read
    # back from the source with a time-range predicate (partition/
    # manifest pruning applies), then swap in atomically: matched
    # buckets update, new buckets insert, and buckets whose rows all
    # vanished delete via the by-source clause SCOPED to the affected
    # set. Cost ∝ affected buckets' source slice — Timescale's
    # invalidation-region behavior.
    if window_is_complete and dml_ok:
        try:
            changes = source.read_changes(last, cur)
        except LakehouseError:
            changes = None
        if changes is not None:
            aff = changes.select(
                time_bucket(spec["time_col"], spec["bucket"]).alias("__b")
            ).distinct()
            scope = _bucket_scope(rollup, source, spec, aff)
            if scope is not None:
                slice_df, by_source_cond, extend_state, n_aff = scope
                try:
                    state = extend_state(
                        _partial_agg(
                            slice_df, spec["time_col"], spec["bucket"],
                            group_by, metrics,
                        )
                    )
                    updates = {
                        out: F.col(f"__src.{out}") for out in metrics
                    }
                    return rollup.merge(
                        state,
                        on=[BUCKET_COL] + group_by,
                        when_matched_update=updates,
                        when_not_matched_insert=True,
                        when_not_matched_by_source_delete=True,
                        when_not_matched_by_source_condition=by_source_cond,
                        summary_extra={
                            "rollup_source_version": cur,
                            "rollup_refresh": "partial-invalidation",
                            "rollup_affected_buckets": n_aff,
                        },
                    )
                finally:
                    aff.unpersist()
            # feed present but no logical changes: just move the mark
            return rollup.merge(
                rollup.read().limit(0),
                on=[BUCKET_COL] + group_by,
                when_matched_update=None,
                when_not_matched_insert=False,
                summary_extra={"rollup_source_version": cur},
            )

    state = _partial_agg(
        source.read(), spec["time_col"], spec["bucket"], group_by, metrics
    )
    return rollup.overwrite(
        state, summary_extra={"rollup_source_version": cur}
    )


def read_rollup(rollup: LakeTable) -> DataFrame:
    """Read rollup state in user-facing form: sketch-state columns
    (approx_distinct) are finalized to BIGINT estimates; every other
    metric column is already its final value."""
    spec = json.loads(rollup.snapshot().properties["rollup_spec"])
    return _finalize_state(rollup.read(), spec)


def read_rollup_realtime(source: LakeTable, rollup: LakeTable) -> DataFrame:
    """Real-time continuous-aggregate read (the TimescaleDB
    ``materialized_only=false`` analog): the materialized state UNIONS
    with the source data that arrived SINCE the watermark — readers
    see up-to-the-commit results without waiting for a refresh, and
    nothing is written.

    Pure-append tail → one partial aggregate over ONLY the new data
    (``read_incremental``), full-outer-joined against the state and
    combined with the same per-metric merge expressions refresh uses
    (cost ∝ new data). A tail containing row-level DML — or a
    watermark not on this ref's ancestry — falls back to aggregating
    the source directly at read time: always correct, one-off
    expensive, and a signal to refresh."""
    spec = json.loads(rollup.snapshot().properties["rollup_spec"])
    metrics = {k: tuple(v) for k, v in spec["metrics"].items()}
    last = _watermark(rollup)
    cur = source.current_version()
    if cur <= last:
        return read_rollup(rollup)
    chain = source._ancestry(cur)
    window = [source.snapshot(v) for v in chain if last < v]
    window_is_complete = last == 0 or last in chain
    keys = [BUCKET_COL] + spec["group_by"]
    if window_is_complete and all(s.operation == "append" for s in window):
        delta = source.read_incremental(last, cur)
        partial = _partial_agg(
            delta, spec["time_col"], spec["bucket"], spec["group_by"],
            metrics,
        )
        state = rollup.read()
        # companions (__retr) are state-internal; the merged frame
        # carries keys + metrics only
        src = partial.select(
            F.struct(*[F.col(c) for c in partial.columns]).alias("__src")
        )
        cond = None
        for k in keys:
            c = state[k].eqNullSafe(F.col(f"__src.{k}"))
            cond = c if cond is None else cond & c
        updates = _pairwise_merge_exprs(metrics)
        merged = state.join(src, cond, "full_outer").select(
            *[
                F.coalesce(state[k], F.col(f"__src.{k}")).alias(k)
                for k in keys
            ],
            *[updates[out].alias(out) for out in metrics],
        )
        return _finalize_state(merged, spec)
    # DML in the tail (or foreign-ancestry watermark): aggregate the
    # source directly — correct under any history, cost O(source)
    fresh = _partial_agg(
        source.read(), spec["time_col"], spec["bucket"],
        spec["group_by"], metrics,
    )
    return _finalize_state(fresh, spec)


def _finalize_state(df: DataFrame, spec: dict) -> DataFrame:
    """State-shaped frame → user-facing form (shared by stored-state
    reads and real-time merged reads; ``drop`` tolerates frames that
    never carried the companion columns)."""
    # retraction-uncertainty companions are internal state, not output
    companions = {
        f"{out}__retr" for out in _budgeted_topk(
            {k: tuple(v) for k, v in spec["metrics"].items()}
        )
    }
    if companions:
        df = df.drop(*companions)
    # groups fully retracted by DML deltas remain as count=0 state rows
    # (the merge can't delete in the same atomic commit); the user face
    # hides them — equivalent to the group not existing
    for out, m in spec["metrics"].items():
        if m[0] == "count" and m[1] == "*":
            df = df.filter(F.coalesce(F.col(out), F.lit(0)) != 0)
            break
    cols = []
    for name in df.columns:
        m = spec["metrics"].get(name)
        if m is not None and m[0] == "approx_distinct":
            cols.append(F.hll_sketch_estimate(F.col(name)).alias(name))
        elif m is not None and m[0] == "approx_topk":
            # finalize: candidate map -> top-k array of (item, count),
            # count-desc with item tie-break
            k = int(m[2]) if len(m) > 2 else 10
            ranked = F.sort_array(
                F.transform(
                    F.map_entries(F.col(name)),
                    lambda kv: F.struct(
                        (-kv["value"]).alias("ncnt"),
                        kv["key"].alias("item"),
                    ),
                )
            )
            cols.append(
                F.transform(
                    F.slice(ranked, 1, k),
                    lambda s: F.struct(
                        s["item"].alias("item"),
                        (-s["ncnt"]).alias("cnt"),
                    ),
                ).alias(name)
            )
        else:
            cols.append(F.col(name))
    return df.select(*cols)
