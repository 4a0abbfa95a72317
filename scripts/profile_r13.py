"""Phase-level profiling of the heavy headline queries (guide §1:
measure first). Times each phase of rollup_incremental,
lake_delete_update and dedup_minhash_lsh with the noop sink so the
numbers isolate computation, plus a single cold pass over every
headline query. Labels jobs via setJobDescription.

Run:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_r13.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pg_lakehouse_spark import get_spark  # noqa: E402
from pg_lakehouse_spark.session import (  # noqa: E402
    dir_input_bytes,
    shuffle_partitions_for,
)
from pg_lakehouse_spark.workload import REGISTRY, _load_all  # noqa: E402
from pg_lakehouse_spark.workload.util import t  # noqa: E402

TIMES: dict[str, float] = {}


def phase(spark, name):
    class _P:
        def __enter__(self):
            spark.sparkContext.setJobDescription(name)
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *exc):
            TIMES[name] = TIMES.get(name, 0.0) + time.perf_counter() - self.t0
            spark.sparkContext.setJobDescription(None)

    return _P()


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile_rollup(spark, sf_dir):
    from pg_lakehouse_spark.rollup import create_rollup, refresh_rollup
    from pg_lakehouse_spark.workload.lake_q import _scratch_catalog

    ev = (
        t(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type", "value")
        .withColumn("value_e2", F.round(F.col("value") * 100).cast("long"))
    )
    with phase(spark, "rollup/scratch_catalog"):
        cat = _scratch_catalog(spark, sf_dir, "profile_rollup")
    with phase(spark, "rollup/create_table_as"):
        src = cat.create_table_as(
            "db", "events_src", ev.filter(F.col("event_id") % 3 == 0)
        )
    with phase(spark, "rollup/create_rollup"):
        roll = create_rollup(
            cat, "db", "events_hourly", src,
            time_col="ts", bucket="1 hour", group_by=["event_type"],
            metrics={
                "n_events": ("count", "*"),
                "value_sum_e2": ("sum", "value_e2"),
                "value_min": ("min", "value"),
                "value_max": ("max", "value"),
            },
        )
    with phase(spark, "rollup/append1"):
        src.append(ev.filter(F.col("event_id") % 3 == 1))
    with phase(spark, "rollup/refresh1"):
        refresh_rollup(src, roll)
    with phase(spark, "rollup/append2"):
        src.append(ev.filter(F.col("event_id") % 3 == 2))
    with phase(spark, "rollup/refresh2"):
        refresh_rollup(src, roll)
    with phase(spark, "rollup/final_read"):
        noop(roll.read())


def profile_lake_dml(spark, sf_dir):
    from pg_lakehouse_spark.workload.lake_q import _scratch_catalog

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    with phase(spark, "lakedml/create_table_as"):
        cat = _scratch_catalog(spark, sf_dir, "profile_dml")
        tbl = cat.create_table_as("db", "li", li)
    with phase(spark, "lakedml/delete"):
        tbl.delete(F.col("l_returnflag") == "R")
    with phase(spark, "lakedml/update"):
        tbl.update(
            F.col("l_linestatus") == "O",
            {"l_quantity": F.col("l_quantity") + 5.0},
        )
    with phase(spark, "lakedml/final_agg"):
        noop(
            tbl.read()
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            )
        )


def profile_minhash(spark, sf_dir):
    from pg_lakehouse_spark.llm.dedup import (
        _exploded_shingles,
        minhash_lsh_candidates,
    )

    docs = t(spark, sf_dir, "documents")
    with phase(spark, "minhash/shingles_only"):
        noop(_exploded_shingles(docs, "doc_id", "text", 3, hashed=True))
    sh = _exploded_shingles(docs, "doc_id", "text", 3, hashed=True).persist()
    with phase(spark, "minhash/persist_shingles"):
        noop(sh)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("__sh"))).alias(f"h{i}")
        for i in range(64)
    ]
    sig = sh.groupBy(F.col("__id").alias("doc_id")).agg(*aggs)
    with phase(spark, "minhash/signatures_from_cache"):
        noop(sig)
    with phase(spark, "minhash/full_pipeline_fresh"):
        out = minhash_lsh_candidates(
            docs, id_col="doc_id", text_col="text",
            n=3, num_hashes=64, bands=16, verify_threshold=0.5,
        )
        n = out.count()
    sh.unpersist()
    print("minhash pairs:", n)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _load_all()
    spark = get_spark(
        "pg_lakehouse_spark-profile",
        shuffle_partitions=shuffle_partitions_for(dir_input_bytes(sf_dir)),
    )
    from pg_lakehouse_spark.tables import load_tables

    for df in load_tables(spark, sf_dir, register=True).values():
        df.select(df.columns[0]).limit(1).count()

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "rollup"):
        profile_rollup(spark, sf_dir)
    if which in ("all", "lakedml"):
        profile_lake_dml(spark, sf_dir)
    if which in ("all", "minhash"):
        profile_minhash(spark, sf_dir)
    if which in ("all", "headline"):
        for name in [
            "q1_pricing_summary", "q3_shipping_priority",
            "q5_local_supplier_volume", "q6_revenue_forecast",
            "q8_market_share", "q9_product_profit",
            "q13_customer_distribution", "q18_large_volume_orders",
            "q_window_topk_per_group", "q_window_running_agg",
            "q_asof_join", "q_cube", "dedup_exact_documents",
            "embed_knn_bruteforce", "text_quality_signals",
            "stream_tumbling_hourly", "stream_session_windows",
            "multimodal_decode", "pack_sequences_stream",
            "ts_gapfill_hourly",
        ]:
            spec = REGISTRY.get(name)
            if spec is None:
                continue
            with phase(spark, f"q/{name}"):
                spec.fn(spark, sf_dir).count()

    for k, v in TIMES.items():
        print(f"{k:40s} {v:8.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
