"""Skew-resilient joins via key salting.

AQE's skew-join handles most skew at runtime (enabled in session.py);
explicit salting remains necessary when one join key holds a large
fraction of ALL rows (power-law keys in web/event data) — a single
Spark partition can't be split below one key without changing the
join key itself.

Construction: the skewed (fact) side gets a deterministic salt in
[0, n) derived from hashing its *entire row*, spreading one hot key
over n partitions; the other side is replicated n× (one copy per
salt). Row-hash salting keeps results reproducible run-to-run —
``rand()`` salts are nondeterministic under task retry, which breaks
exactly-once semantics at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to heavy key skew on the ``skewed`` side.

    Cost: ``other`` is replicated ``salt_buckets``× through the
    shuffle — size the bucket count to the skew factor, not higher.
    Result is identical to ``skewed.join(other, on, how)``.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            "salted_join supports inner/left joins (replicating the "
            f"non-skewed side breaks {how!r} semantics)"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets))
    left = skewed.withColumn(_SALT, salt.cast("int"))
    right = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("int"))
    return left.join(right, on + [_SALT], how).drop(_SALT)
