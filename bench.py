"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pg_lakehouse_spark import get_spark  # noqa: E402
from pg_lakehouse_spark.session import (  # noqa: E402
    dir_input_bytes,
    shuffle_partitions_for,
)
from pg_lakehouse_spark.workload import REGISTRY, _load_all  # noqa: E402

# Headline set: one representative per operator family, weighted toward
# the scale-sensitive ones (joins, windows, dedup, ANN, streaming,
# lakehouse DML).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q18_large_volume_orders",
    "q_window_topk_per_group",
    "q_window_running_agg",
    "q_asof_join",
    "q_cube",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "embed_knn_bruteforce",
    "text_quality_signals",
    "stream_tumbling_hourly",
    "stream_session_windows",
    "multimodal_decode",
    "lake_delete_update",
    "rollup_incremental",
    "pack_sequences_stream",
    "ts_gapfill_hourly",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    _load_all()
    spark = get_spark(
        "pg_lakehouse_spark-bench",
        shuffle_partitions=shuffle_partitions_for(dir_input_bytes(sf_dir)),
    )
    # Warm the JVM, the per-session table-plan cache, every fixture
    # table's parquet footer, and EVERY headline query's compiled plan
    # ONCE (excluded from timings, standard practice: we measure
    # steady-state query time, not JVM start, first-touch file
    # listing, or whole-stage-codegen/Arrow-UDF compilation — none of
    # which scale with data size; profiled at sf0.1 the cold-plan
    # penalty is ~1.5-2 s per distinct query shape, pure constant).
    try:
        from pg_lakehouse_spark.tables import load_tables

        for df in load_tables(spark, sf_dir, register=True).values():
            df.select(df.columns[0]).limit(1).count()
    except Exception:
        pass
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        try:
            spec.fn(spark, sf_dir).count()
        except Exception:
            pass  # the timed loop reports the error

    # Failure isolation: one broken query must not zero the round's
    # perf artifact — time what runs, report {"err": ...} for the rest,
    # ALWAYS print the JSON line.
    def timed_pass() -> tuple[dict[str, float], dict[str, str]]:
        timings: dict[str, float] = {}
        errors: dict[str, str] = {}
        for name in HEADLINE:
            spec = REGISTRY.get(name)
            if spec is None:
                errors[name] = "not registered"
                continue
            start = time.perf_counter()
            try:
                df = spec.fn(spark, sf_dir)
                n = df.count()
                assert n >= 0
                timings[name] = round(time.perf_counter() - start, 4)
            except Exception as exc:  # noqa: BLE001 — isolate per query
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        return timings, errors

    # COLD phase: drop every dataset the warm-up loop persisted so the
    # headline number measures real parquet-scan + shuffle work, not a
    # warm block-manager (r3/r4 verdict: persist-bearing queries were
    # reporting warm-cache numbers, and contention artifacts couldn't
    # be told apart from regressions in the JSON).
    # r11 (verdict item 10): BOTH phases run 3 passes and report the
    # per-query MEDIAN — two of the last three rounds produced
    # noisy-neighbor artifacts that needed manual adjudication; a
    # median absorbs a single contended pass.
    def median_of(passes: list[dict[str, float]]) -> dict[str, float]:
        out: dict[str, float] = {}
        for k in {k for p in passes for k in p}:
            vals = sorted(p[k] for p in passes if k in p)
            if vals:
                out[k] = round(vals[len(vals) // 2], 4)
        return out

    cold_passes, errors = [], {}
    for _ in range(3):
        spark.catalog.clearCache()
        c, errs = timed_pass()
        cold_passes.append(c)
        errors.update(errs)
    cold = median_of(cold_passes)
    # WARM phase: same queries with whatever the last cold pass left
    # cached — steady-state number for cache-reusing workloads.
    warm_passes, warm_errors = [], {}
    for _ in range(3):
        w, werrs = timed_pass()
        warm_passes.append(w)
        warm_errors.update(werrs)
    warm = median_of(warm_passes)
    total_cold = round(sum(cold.values()), 4)
    total_warm = round(sum(warm.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                # headline value = COLD total (the honest, cache-free run)
                "value": total_cold,
                "value_cold": total_cold,
                "value_warm": total_warm,
                "unit": "sec",
                "queries": {**cold, **{k: {"err": v} for k, v in errors.items()}},
                "queries_warm": {
                    **warm, **{k: {"err": v} for k, v in warm_errors.items()}
                },
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "passes": 3,
                "aggregation": "median",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
