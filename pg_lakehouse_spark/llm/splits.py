"""Deterministic dataset splitting and sampling for training pipelines.

Splits must be (a) reproducible run-to-run, (b) stable under
repartitioning and cluster-size changes, and (c) disjoint+exhaustive.
Random-number approaches (``rand()``, ``randomSplit``) violate (b):
their assignment depends on partition layout. Everything here derives
the assignment from row *content*, so a row's split never changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(bucket: Column, weights: dict[str, float], denom: int) -> Column:
    """Map a bucket in [0, denom) to named splits by cumulative weight."""
    total = sum(weights.values())
    expr = None
    cum = 0.0
    for name, w in weights.items():
        cum += w / total
        bound = int(round(cum * denom))
        cond = bucket < bound
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(F.lit(list(weights)[-1]))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
    denom: int = 10_000,
) -> DataFrame:
    """Content-hash split: bucket = xxhash64(seed, id) mod denom.

    The production splitter — uniform regardless of id distribution
    (sequential, clustered, or sparse ids all split at the requested
    ratios), stable under any repartitioning.
    """
    bucket = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(denom))
    return df.withColumn(split_col, _bucket_expr(bucket, weights, denom))


def modulo_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    split_col: str = "split",
    denom: int = 10_000,
) -> DataFrame:
    """Modulo split: bucket = id mod denom. Only uniform when ids are
    dense/sequential — but expressible identically in any SQL engine,
    so it's the oracle-checkable twin of :func:`hash_split`."""
    bucket = F.pmod(F.col(id_col).cast("long"), F.lit(denom))
    return df.withColumn(split_col, _bucket_expr(bucket, weights, denom))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fraction_per_stratum: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its content
    hash falls under the stratum's fraction. Unlike ``df.sampleBy``,
    results don't depend on partitioning."""
    denom = 1_000_000
    bucket = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(denom))
    cond = F.lit(False)
    for stratum, frac in fraction_per_stratum.items():
        cond = cond | (
            (F.col(strata_col) == stratum) & (bucket < int(frac * denom))
        )
    return df.filter(cond)


def balance_by_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    order_by: Column | str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-key document cap (domain balancing): keep at most ``cap``
    rows per ``key_col`` value — the C4/RefinedWeb counter to a few
    giant hosts dominating the corpus.

    The kept subset is DETERMINISTIC: rows rank by ``order_by``
    (default: a multiplicative hash of ``id_col``, so the survivors
    are an unbiased pseudo-random sample per key, stable across runs
    and partitionings — ranking by raw id would always keep the
    oldest crawl records). One shuffle: a window
    ``row_number() OVER (PARTITION BY key ORDER BY rank, id)``; the
    id tiebreak makes the ranking total. Skew note: a pathologically
    hot key ranks on a single partition — at 100 TB, pre-filter such
    keys with an aggregate count and exact top-``cap`` per hot key if
    one key exceeds executor memory.
    """
    from pyspark.sql.window import Window

    if order_by is None:
        # multiplicative hash — expressible in any SQL engine (the
        # oracle twin), unlike xxhash64
        order_by = F.pmod(
            F.col(id_col).cast("long") * 1103515245 + 12345,
            F.lit(2147483648),
        )
    elif isinstance(order_by, str):
        order_by = F.col(order_by)
    w = Window.partitionBy(key_col).orderBy(order_by, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
