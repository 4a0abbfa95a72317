"""r14: phase-level profile of dedup_minhash_lsh — wall + job counts
for: sets persist materialization, signature agg, banding pairs,
verify join + localCheckpoint."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pg_lakehouse_spark import get_spark  # noqa: E402
from pg_lakehouse_spark.functions.hashing import prefixed_xxhash64  # noqa: E402
from pg_lakehouse_spark.llm.text import shingles  # noqa: E402
from pg_lakehouse_spark.session import (  # noqa: E402
    dir_input_bytes,
    shuffle_partitions_for,
)
from pg_lakehouse_spark.workload import REGISTRY, _load_all  # noqa: E402
from pg_lakehouse_spark.workload.lake_q import t  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    _load_all()
    spark = get_spark(
        "minhash-phase-profile",
        shuffle_partitions=shuffle_partitions_for(dir_input_bytes(sf_dir)),
    )
    REGISTRY.get("dedup_minhash_lsh").fn(spark, sf_dir).count()  # warm

    n, num_hashes, bands = 3, 64, 16
    r = num_hashes // bands
    for rep in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        docs = t(spark, sf_dir, "documents")
        arr = F.transform(shingles(F.col("text"), n), lambda s: F.xxhash64(s))
        sets = docs.select(F.col("doc_id").alias("__id"), arr.alias("__arr")).persist()
        sets.count()
        t1 = time.perf_counter()
        sh = sets.select("__id", F.explode("__arr").alias("__sh"))
        aggs = [
            F.min(prefixed_xxhash64(i, F.col("__sh"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
        sig = sh.groupBy(F.col("__id").alias("doc_id")).agg(*aggs).persist()
        sig.count()
        t2 = time.perf_counter()
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.hash(*[F.col(f"h{b * r + i}") for i in range(r)]).alias("bh"),
                )
                for b in range(bands)
            ]
        )
        bucketed = sig.select(
            F.col("doc_id").alias("__id"), F.explode(band_structs).alias("bb")
        ).select("__id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
        left = bucketed.select(F.col("__id").alias("id1"), "band", "bh")
        right = bucketed.select(F.col("__id").alias("id2"), "band", "bh")
        pairs = (
            left.join(right, ["band", "bh"])
            .filter(F.col("id1") < F.col("id2"))
            .select("id1", "id2")
            .distinct()
            .persist()
        )
        pairs.count()
        t3 = time.perf_counter()
        a = sets.select(
            F.col("__id").alias("id1"),
            F.col("__arr").alias("__a1"),
            F.size("__arr").alias("__n1"),
        )
        b = sets.select(
            F.col("__id").alias("id2"),
            F.col("__arr").alias("__a2"),
            F.size("__arr").alias("__n2"),
        )
        inter = F.size(F.array_intersect(F.col("__a1"), F.col("__a2")))
        out = (
            pairs.join(a, "id1")
            .join(b, "id2")
            .withColumn("__i", inter)
            .withColumn(
                "jaccard",
                F.col("__i") / (F.col("__n1") + F.col("__n2") - F.col("__i")),
            )
            .filter(F.col("jaccard") >= 0.5)
            .select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))
        )
        out = out.localCheckpoint(eager=True)
        sets.unpersist()
        sig.unpersist()
        pairs.unpersist()
        out.count()
        t4 = time.perf_counter()
        print(
            f"rep {rep}: sets {t1-t0:.3f}  sig {t2-t1:.3f}  "
            f"pairs {t3-t2:.3f}  verify+ckpt {t4-t3:.3f}  total {t4-t0:.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
