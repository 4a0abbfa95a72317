"""Z-order (Morton) clustering keys for multi-dimensional data skipping.

Files pruned by per-file min/max bounds (lakehouse manifest stats) only
skip when data is CLUSTERED on the filter column. A linear sort
clusters one column perfectly and the others not at all; interleaving
the bits of several columns' bucket ranks (Morton order — the public
Z-order curve Delta/Iceberg use for the same purpose) gives every
participating column locality, so range filters on ANY of them skip
files.

Construction is pure JVM expressions: per-column uniform bucketing via
``width_bucket`` over the column's [min, max] (two scalars per column
collected to the driver — metadata, not data), then bit interleave via
shift/or. Uniform buckets are stats-cheap; heavily skewed columns
would want quantile buckets instead (documented trade-off).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12
) -> tuple[DataFrame, Column]:
    """Return (df, key_column) where key_column is the Morton code of
    ``cols``. ``bits`` per column; len(cols)*bits must fit in 63."""
    ncols = len(cols)
    if ncols < 1:
        raise ValueError("zorder_key needs at least one column")
    if ncols * bits > 63:
        raise ValueError(f"{ncols} cols x {bits} bits exceeds int64")
    # 2 scalars per column — bounded driver metadata, never data-sized
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    stats = df.agg(*aggs).collect()[0]

    nbuckets = 1 << bits
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lo, hi = float(stats[f"__lo_{c}"]), float(stats[f"__hi_{c}"])
        if hi <= lo:
            continue  # constant column contributes nothing
        bucket = (
            F.width_bucket(F.col(c).cast("double"), F.lit(lo), F.lit(hi),
                           F.lit(nbuckets))
            - 1
        ).cast("long")
        bucket = F.greatest(F.lit(0), F.least(F.lit(nbuckets - 1), bucket))
        for i in range(bits):
            bit = F.shiftright(bucket, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return df, z
