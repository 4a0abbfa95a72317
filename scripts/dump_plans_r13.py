"""Dump .explain('formatted') for every headline bench query into
plans/r13/<query>_<tag>.txt (tag = before/after, argv[1]).

DML-lifecycle queries (lake_*, rollup_*, stream_cdc_*) execute their
side effects when the query function is built; the captured plan is the
plan of the RETURNED DataFrame (the final read) — internal phases are
profiled separately by scripts/profile_r13.py and documented in
OPTIMIZATION_r13.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_lakehouse_spark import get_spark  # noqa: E402
from pg_lakehouse_spark.session import (  # noqa: E402
    dir_input_bytes,
    shuffle_partitions_for,
)
from pg_lakehouse_spark.workload import REGISTRY, _load_all  # noqa: E402

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
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    _load_all()
    spark = get_spark(
        "pg_lakehouse_spark-plans",
        shuffle_partitions=shuffle_partitions_for(dir_input_bytes(sf_dir)),
    )
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
