"""r14: phase-level profile of rollup_incremental — wall time + Spark
job count per lifecycle step (CTAS, create_rollup, append x2,
refresh x2, final read), plus driver-side time with NO jobs running
(commit/manifest work). Usage:

  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_rollup_phases_r14.py [reps]
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
from pg_lakehouse_spark.workload.lake_q import _scratch_catalog, t  # noqa: E402
from pg_lakehouse_spark.timeutil import epoch_us  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    _load_all()
    spark = get_spark(
        "rollup-phase-profile",
        shuffle_partitions=shuffle_partitions_for(dir_input_bytes(sf_dir)),
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    from pg_lakehouse_spark.rollup import create_rollup, refresh_rollup

    # warm-up: full query once
    REGISTRY.get("rollup_incremental").fn(spark, sf_dir).count()

    for rep in range(reps):
        spark.catalog.clearCache()
        phases: list[tuple[str, float, int]] = []

        def run(name, fn):
            group = f"rollup-{rep}-{name}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            ids = tracker.getJobIdsForGroup(group)
            phases.append((name, dt, len(ids)))
            sc.setJobGroup("", "")
            return out

        ev = (
            t(spark, sf_dir, "events")
            .select("event_id", "ts", "event_type", "value")
            .withColumn("value_e2", F.round(F.col("value") * 100).cast("long"))
            .persist()
        )
        try:
            cat = run(
                "scratch_catalog", lambda: _scratch_catalog(spark, sf_dir, "rollup_inc")
            )
            src = run(
                "ctas",
                lambda: cat.create_table_as(
                    "db", "events_src", ev.filter(F.col("event_id") % 3 == 0)
                ),
            )
            roll = run(
                "create_rollup",
                lambda: create_rollup(
                    cat, "db", "events_hourly", src,
                    time_col="ts", bucket="1 hour", group_by=["event_type"],
                    metrics={
                        "n_events": ("count", "*"),
                        "value_sum_e2": ("sum", "value_e2"),
                        "value_min": ("min", "value"),
                        "value_max": ("max", "value"),
                    },
                ),
            )
            run("append1", lambda: src.append(ev.filter(F.col("event_id") % 3 == 1)))
            run("refresh1", lambda: refresh_rollup(src, roll))
            run("append2", lambda: src.append(ev.filter(F.col("event_id") % 3 == 2)))
            run("refresh2", lambda: refresh_rollup(src, roll))
            run(
                "final_read",
                lambda: roll.read()
                .select(
                    epoch_us(F.col("bucket_start")).alias("bucket_us"),
                    "event_type", "n_events", "value_sum_e2",
                    "value_min", "value_max",
                )
                .count(),
            )
        finally:
            ev.unpersist()
        total = sum(p[1] for p in phases)
        print(f"--- rep {rep}: total {total:.3f}s")
        for name, dt, jobs in phases:
            print(f"  {name:16s} {dt:7.3f}s {jobs:3d} jobs")
    spark.stop()


if __name__ == "__main__":
    main()
