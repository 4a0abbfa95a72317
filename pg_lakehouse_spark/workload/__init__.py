"""The oracle-checked query workload (driver contract).

Every operator claimed in SURVEY.md §2 gets a named query here with
(a) a Spark DataFrame implementation and, where ANSI-SQL-expressible,
(b) an equivalent DuckDB oracle SQL string. ``__spark_entry__.py``
re-exports this registry.

Float discipline: the driver hash-compares values, and double
aggregation order differs between Spark and DuckDB, so every floating
aggregate is rounded (2-6 decimals) identically on both sides.
Column-name discipline: every computed column is aliased identically
on both sides.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclasses.dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the suite."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


# The driver's correctness harness checks the FIRST 50 registry entries
# (positional). Order breadth-first so every SURVEY.md §2 family lands at
# least one representative inside that window: joins (all shapes incl.
# as-of), subqueries/recursive CTE, set ops, distinct, top-k, filter ops,
# agg variants (approx incl.), grouping sets/cube, pivot/unpivot, windows,
# functions, UDF/UDAF/UDTF, TPC-H shape, the whole lakehouse tier (DML
# CoW+MoR, time travel, tags/rollback, schema/partition evolution, CDC,
# incremental rollup), LLM ops (dedup, text, ANN, multimodal, splits,
# decontamination, packing/interleave, BM25), streaming (incl. the CDC
# source pipeline), SQL views, and time-series gap-fill. Families with
# several window slots in earlier rounds ceded duplicates to the new
# families (the displaced queries stay oracle-checked in the local
# suite). r6 rotation: q_full_outer_join / q_anti_join /
# q_distinct_agg / q_generate_series (families keep another window
# representative each) ceded to lake_hidden_partitioning /
# lake_merge_composite_key / lake_delete_by_keys /
# rollup_topk_retraction so the driver artifact exercises the r5
# work; q_python_udtf_bigrams (UDF family keeps the pandas-UDF row)
# and stream_session_windows (streaming keeps tumbling + CDC) ceded
# to the new-in-r6 dedup_lines_corpus / balance_source_cap;
# interleave_language_mix ceded to its newer family-mate
# interleave_temperature and text_chunking (text family keeps
# text_quality_signals) to lake_manifest_segments so the r6
# manifest-segmentation work shows in the driver artifact.
# r7 rotation: lake_merge_upsert (merge family keeps
# lake_merge_composite_key), lake_delete_update (CoW DML stays via
# lake_sql_dml; MoR via lake_mor_delete_update), lake_tag_rollback
# (time travel keeps lake_time_travel), dedup_embedding_pairs (dedup
# keeps exact/minhash/lines; ANN keeps embed_knn_bruteforce) and
# data_split_modulo (splits keep balance_source_cap +
# decontaminate_overlap) ceded to the five new-in-r7 rows:
# lake_null_ordering_topk (PG NULL placement under LIMIT),
# lake_dml_returning (RETURNING without the change feed),
# lake_join_dml_aliasless (bare-name join-DML correlation),
# lake_pg_literal_kit (dollar-quoting/E-strings/array[..]),
# lake_segment_bloom_prune (descriptor-level bloom skipping). NOTE:
# the split family's only window row is data_split_modulo
# (balance_source_cap is the domain-balance family), so the fifth
# cede is dedup_lines_corpus instead — dedup keeps exact + minhash
# in-window, lines stays oracle-checked in the registry.
# r8 rotation (5 in / 5 out): in come the verdict-requested r7-built
# rows q_ordered_aggregates, dedup_duplicate_spans, dedup_span_share
# plus the two new-in-r8 rows lake_implicit_correlation (the r7
# verdict headline: bare-name correlation + identifier case folding)
# and lake_fetch_with_ties. Ceded family duplicates:
# lake_delete_by_keys (delete family keeps lake_sql_dml CoW +
# lake_mor_delete_update MoR), lake_manifest_segments and
# lake_bloom_pointlookup (the segment/bloom family keeps
# lake_segment_bloom_prune, which asserts the prune inside the
# artifact; the FK point-lookup fast path stays spy-asserted in
# tests/test_manifests.py), lake_join_dml_aliasless (bare-name
# correlation is subsumed by the broader lake_implicit_correlation;
# join-DML itself stays exercised through the feed-free RETURNING
# parity tests), lake_null_ordering_topk (NULL placement keeps the
# de-pinned differential fuzzers + the WITH TIES row's explicit
# NULLS handling; the row stays oracle-checked locally).
# r9 rotation (2 in / 2 out, per verdict item 9): in come the
# r8-built oracle rows lake_subquery_dml (correlated-subquery WHERE
# DML — now MoR position-delete backed) and
# lake_recursive_union_graph (UNION-DISTINCT cyclic closure). Ceded
# family duplicates: q_recursive_cte (recursion family keeps the
# UNION-DISTINCT row in-window; the UNION ALL shape stays
# oracle-checked locally) and lake_dml_returning (DML family keeps
# lake_sql_dml CoW + lake_mor_delete_update MoR +
# lake_merge_composite_key; RETURNING stays oracle-checked locally).
# r10 rotation (4 in / 4 out, per verdict item 6): in come the
# r9-built rows lake_keyset_pagination (row-constructor comparison
# pushdown), lake_unnest_ordinality, lake_sequence_enum, plus the
# new-in-r10 q_age_intervals (PG age() month normalization — the r9
# verdict's headline silent divergence, DuckDB-oracled). Ceded
# family duplicates: dedup_span_share (span-dedup family keeps
# dedup_duplicate_spans), stream_tumbling_hourly (streaming
# family keeps stream_cdc_pipeline — source->transform->sink with
# the same windowed-agg machinery; the registry guard's exact-twin
# policy keeps q_percentiles in-window), text_bm25_postings (text family keeps
# text_quality_signals; BM25 stays oracle-checked locally) and
# lake_change_feed (CDC family keeps stream_cdc_pipeline in-window;
# the batch feed also runs inside rollup_incremental every round).
# r11 rotation (2 in / 2 out, per verdict item 7): in come
# q_cast_rounding (NEW in r11 — the r10 verdict headline: PG rounding
# on fractional→int casts, every leg a forced .5 tie so truncation,
# half-away and half-even all disagree; DuckDB-oracled) and
# lake_sql_function (r10-built CREATE FUNCTION LANGUAGE SQL, now with
# the r11 qualified-call-site fix). Ceded sql-frontend family
# duplicates (the family keeps q_age_intervals, lake_keyset_pagination,
# lake_unnest_ordinality, lake_sequence_enum, lake_implicit_correlation
# in-window): lake_fetch_with_ties and lake_pg_literal_kit — both stay
# oracle-checked in the local registry suite.
# r12 rotation (3 in / 3 out, per verdict item 8): in come
# lake_assignment_cast (NEW in r12 — the r11 verdict headline:
# IMPLICIT assignment-cast rounding on DML stores, every INSERT...
# SELECT row a forced .5 tie; DuckDB rounds on insert, so fully
# oracle-scored), plus the r11-built rows q_date_bin_buckets
# (date_bin interval-stride grid over events vs DuckDB time_bucket)
# and lake_serial_identity (per-row SERIAL/identity sequence
# assignment). Ceded family duplicates: lake_sequence_enum (the
# sequence surface now shows through lake_serial_identity; ENUM
# label checks stay oracle-checked locally), dedup_duplicate_spans
# (dedup family keeps dedup_exact_documents + dedup_minhash_lsh
# in-window; span dedup stays oracle-checked locally) and
# rollup_topk_retraction (rollup family keeps rollup_incremental,
# which exercises the same change-feed machinery; the retraction IVM
# stays oracle-checked locally).
# Everything else follows in registration order.
_PRIORITY: tuple[str, ...] = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "lake_avro_roundtrip",
    "q_except_all",
    "lake_hidden_partitioning",
    "lake_txn_multi_table",
    "q_range_join_bands",
    "q_age_intervals",
    "q_asof_join",
    "q_correlated_subquery",
    "lake_recursive_union_graph",
    "lake_merge_composite_key",
    "q_distinct_on",
    "lake_keyset_pagination",
    "lake_branch_wap",
    "pack_sequences_stream",
    "q_ordered_aggregates",
    "q_percentiles",
    "lake_unnest_ordinality",
    "interleave_temperature",
    "q_cube",
    "q_pivot",
    "lake_assignment_cast",
    "q_window_topk_per_group",
    "q_date_bin_buckets",
    "ts_gapfill_hourly",
    "q_pg_function_kit",
    "lake_serial_identity",
    "q_pandas_udf_normalize",
    "lake_sql_views",
    "data_split_modulo",
    "lake_sql_dml",
    "q_cast_rounding",
    "lake_subquery_dml",
    "lake_mor_delete_update",
    "lake_time_travel",
    "lake_implicit_correlation",
    "lake_schema_evolution",
    "lake_partition_evolution",
    "rollup_incremental",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "lake_sql_function",
    "text_quality_signals",
    "embed_knn_bruteforce",
    "multimodal_decode",
    "lake_segment_bloom_prune",
    "decontaminate_overlap",
    "balance_source_cap",
    "stream_cdc_pipeline",
)


def _ordered() -> dict[str, QuerySpec]:
    _load_all()
    out: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        if name in REGISTRY:
            out[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in out:
            out[name] = spec
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _ordered().items()
        if spec.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every workload module exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from pg_lakehouse_spark.workload import (  # noqa: F401
        core,
        functions_q,
        lake_q,
        llm_q,
        streaming_q,
        tpch_more,
        udf_q,
        windows_q,
    )

    _LOADED = True
