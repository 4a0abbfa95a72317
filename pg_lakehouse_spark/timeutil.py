"""Timestamp-encoding normalization and epoch helpers.

The driver-generated corpus has stored ``events.ts`` under three
different parquet encodings across regenerations:

- ``timestamp[ns]`` (TIMESTAMP(NANOS)) — Spark can only read it with
  ``spark.sql.legacy.parquet.nanosAsLong=true``, i.e. as an int64 of
  epoch-nanoseconds;
- ``timestamp[us]`` with ``isAdjustedToUTC=false`` — Spark ≥3.4 infers
  ``TIMESTAMP_NTZ``;
- ``timestamp[us]`` with ``isAdjustedToUTC=true`` — plain ``TIMESTAMP``.

Everything downstream (as-of joins, streaming windows, rollup
time_bucket) wants ONE canonical type. The session timezone is pinned
UTC (session.py), so ``TIMESTAMP_NTZ -> TIMESTAMP`` casts are
value-identical and these helpers are safe on any of the three.

Reference parity: the reference reads Iceberg ``timestamp`` /
``timestamptz`` into PG timestamp types uniformly
(pg_lakehouse_iceberg bridge type mapping); this module is the Spark
seam that gives the same "one timestamp type inside the engine"
guarantee regardless of what the files say.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType


def epoch_us(col: Column | str) -> Column:
    """Epoch microseconds of a timestamp-ish column.

    Robust to ``TIMESTAMP`` and ``TIMESTAMP_NTZ`` inputs: the cast to
    ``timestamp`` is a no-op on the former and (under a UTC session
    timezone) value-identical on the latter. Stays inside whole-stage
    codegen — no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def normalize_ts(df: DataFrame, cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Normalize the named columns to canonical ``TIMESTAMP`` whatever
    the fixture encoding delivered: int64 epoch-nanos, TIMESTAMP_NTZ,
    or TIMESTAMP. Columns absent from the frame are ignored."""
    by_name = {f.name: f.dataType for f in df.schema.fields}
    for name in cols:
        dt = by_name.get(name)
        if dt is None:
            continue
        if isinstance(dt, LongType):
            df = df.withColumn(
                name, F.timestamp_micros(F.expr(f"`{name}` div 1000"))
            )
        elif isinstance(dt, TimestampNTZType):
            df = df.withColumn(name, F.col(name).cast(TimestampType()))
        # TimestampType: already canonical
    return df
