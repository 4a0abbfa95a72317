"""Benchmark decontamination: flag (or drop) training documents that
share word n-grams with an evaluation/benchmark set.

The standard LLM-pipeline hygiene step (e.g. GPT-3's 13-gram and
Llama's n-gram overlap filters): any training document containing
enough distinct n-grams from a benchmark document is "contaminated"
and must be excluded before training, or eval scores are inflated.

Scale shape: both sides explode to distinct hashed shingles (the same
single-scan zipped-shift machinery as the dedup pipeline,
`llm/text.py::shingles`); the benchmark side is tiny relative to the
corpus, so the shingle join broadcasts it — the corpus is touched in
ONE pass with no shuffle of the documents themselves. Reference
parity: none (the reference is a storage extension); this is
north-star Tier-C scope (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_lakehouse_spark.llm.dedup import _exploded_shingles


def ngram_overlap(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """(doc, benchmark, #shared distinct n-grams) pairs with at least
    ``min_overlap`` overlap. Shingles are hashed to int64 before the
    join (fixed-width keys; membership preserved up to 2^-64
    collisions)."""
    d = _exploded_shingles(docs, id_col, text_col, n, hashed=True)
    b = _exploded_shingles(
        bench, bench_id_col, bench_text_col, n, hashed=True
    ).select(F.col("__id").alias("__bid"), "__sh")
    if broadcast_bench:
        b = F.broadcast(b)
    return (
        d.join(b, "__sh")
        .groupBy(
            F.col("__id").alias(id_col), F.col("__bid").alias(bench_id_col)
        )
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def remove_contaminated(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """The clean corpus: documents whose n-gram overlap with ANY
    benchmark document stays below ``min_overlap`` (left-anti join on
    the flagged ids — no row of the corpus is ever collected)."""
    bench_keyed = bench.select(
        F.monotonically_increasing_id().alias("__bench"),
        F.col(bench_text_col).alias("__btext"),
    )
    flagged = ngram_overlap(
        docs, bench_keyed, n=n, min_overlap=min_overlap,
        id_col=id_col, text_col=text_col,
        bench_id_col="__bench", bench_text_col="__btext",
    ).select(id_col).distinct()
    return docs.join(flagged, on=id_col, how="left_anti")
