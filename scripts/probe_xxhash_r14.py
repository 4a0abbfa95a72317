"""Probe (r14): can the minhash signature family be computed with HALF
the hash work, bit-identically?

Fact under test: Spark's multi-arg xxhash64 chains per-field, using the
running hash as the next field's seed — so
``xxhash64(lit(i), col)`` == ``XxHash64(seed = xxhash64_long(i, 42))(col)``,
one hashLong instead of two. The seeded form isn't exposed in the API,
but the catalyst expression takes a seed; we build it over py4j and
verify bit-equality, then time both forms.

Run: python scripts/probe_xxhash_r14.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pg_lakehouse_spark import get_spark  # noqa: E402

MASK = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte little-endian long, as Spark's XXH64.hashLong."""
    value &= MASK
    h = (seed + P5 + 8) & MASK
    k1 = _rotl((value * P2) & MASK, 31)
    k1 = (k1 * P1) & MASK
    h ^= k1
    h = ((_rotl(h, 27) * P1) + P4) & MASK
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte int, as Spark's XXH64.hashInt (the per-field
    step for IntegerType children like ``F.lit(i)``)."""
    h = (seed + P5 + 4) & MASK
    h ^= ((value & 0xFFFFFFFF) * P1) & MASK
    h = ((_rotl(h, 23) * P2) + P3) & MASK
    return _fmix(h)


def to_signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def seeded_xxhash64(spark, col, seed: int):
    """Column: XxHash64 with an explicit seed over one child column."""
    from pyspark.sql.classic.column import Column as CCol, _to_java_column

    jvm = spark._jvm
    sc = spark.sparkContext
    expr_cls = jvm.org.apache.spark.sql.catalyst.expressions.XxHash64
    # Column -> catalyst Expression (classic mode)
    utils = jvm.org.apache.spark.sql.classic.ExpressionUtils
    child = utils.expression(_to_java_column(col))
    seq = sc._jvm.PythonUtils.toSeq([child])
    jexpr = expr_cls(seq, to_signed(seed))
    return CCol(utils.column(jexpr))


def main() -> None:
    spark = get_spark("probe-xxhash-r14")
    n = 2_000_000
    base = spark.range(n).select(
        F.xxhash64(F.concat(F.lit("shingle-"), F.col("id"))).alias("sh"),
        (F.col("id") % 10000).alias("__id"),
    )

    # 1. validate the Python model of hashLong against Spark
    probe = spark.range(5).select(
        F.col("id"), F.xxhash64(F.col("id")).alias("h")
    ).collect()
    for r in probe:
        mine = to_signed(xxh64_long(r["id"], 42))
        assert mine == r["h"], (r["id"], mine, r["h"])
    print("python xxh64_long model: OK")

    # 2. bit-equality of the seeded one-field form vs the two-field form
    try:
        seeded = seeded_xxhash64(spark, F.col("sh"), xxh64_int(7, 42))
    except Exception as exc:  # noqa: BLE001
        print("JVM construction FAILED:", exc)
        spark.stop()
        return
    diff = (
        base.limit(100000)
        .select(
            (F.xxhash64(F.lit(7), F.col("sh")) == seeded).alias("eq")
        )
        .filter(~F.col("eq"))
        .count()
    )
    print("bit-equality mismatches:", diff)
    assert diff == 0

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    b = base.persist()
    noop(b)

    # 3. timing: 64-min signature agg, two-field vs seeded one-field
    for label, mk in [
        ("two-field xxhash64(lit(i), sh)",
         lambda i: F.xxhash64(F.lit(i), F.col("sh"))),
        ("seeded one-field XxHash64",
         lambda i: seeded_xxhash64(spark, F.col("sh"), xxh64_int(i, 42))),
    ]:
        aggs = [F.min(mk(i)).alias(f"h{i}") for i in range(64)]
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            noop(b.groupBy("__id").agg(*aggs))
            times.append(time.perf_counter() - t0)
        print(f"{label}: min {min(times):.3f}s  all "
              + " ".join(f"{t:.3f}" for t in times))
    b.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
