"""Iceberg time/uuid/fixed logical-type mapping (logical_types).

Reference bridge names these types (iceberg_bridge.cpp:131-153); Spark
has no TIME/UUID, so the engine mapping is time→long-µs, uuid→binary16,
fixed(n)→binary+width-check. Tests cover conversions (incl. NULL and
malformed inputs), lakehouse round-trip with DML, and metadata
annotations surviving storage.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from pg_lakehouse_spark import logical_types as lt
from pg_lakehouse_spark.lakehouse import LakeCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "wh"))


def test_time_str_conversions(spark):
    df = spark.createDataFrame(
        [("00:00:00",), ("23:59:59.999999",), ("12:34:56.5",), (None,),
         ("25:00:00",), ("bogus",)],
        "t string",
    )
    out = df.select(
        lt.time_str_to_micros("t").alias("us")
    ).collect()
    assert out[0].us == 0
    assert out[1].us == lt.US_PER_DAY - 1
    assert out[2].us == (12 * 3600 + 34 * 60 + 56) * 1_000_000 + 500000
    assert out[3].us is None
    assert out[4].us is None  # hour 25 → NULL, not garbage
    assert out[5].us is None


def test_time_roundtrip_formatting(spark):
    vals = [0, 1, 59_999_999, 3_600_000_000, lt.US_PER_DAY - 1]
    df = spark.createDataFrame([(v,) for v in vals], "us long")
    back = df.select(
        lt.time_str_to_micros(lt.micros_to_time_str("us")).alias("rt"), "us"
    ).collect()
    for r in back:
        assert r.rt == r.us
    # lexicographic order of the formatted string == numeric order
    strs = [r[0] for r in df.select(lt.micros_to_time_str("us")).collect()]
    assert strs == sorted(strs)


def test_time_bucket_of_day(spark):
    df = spark.range(1).select(
        lt.time_bucket_of_day(lt.time_str_to_micros(F.lit("09:17:30")), 15).alias("b")
    )
    assert df.collect()[0].b == (9 * 3600 + 15 * 60) * 1_000_000


def test_uuid_conversions(spark):
    ids = [uuid.UUID(int=7), uuid.uuid5(uuid.NAMESPACE_DNS, "x")]
    df = spark.createDataFrame([Row(u=i.bytes) for i in ids] + [Row(u=None)])
    out = df.select(lt.uuid_to_str("u").alias("s")).collect()
    assert out[0].s == str(ids[0])
    assert out[1].s == str(ids[1])
    assert out[2].s is None
    # string → binary → string round-trip; malformed → NULL
    df2 = spark.createDataFrame(
        [(str(ids[0]),), (str(ids[1]).upper(),), ("not-a-uuid",), (None,)], "s string"
    )
    back = df2.select(lt.uuid_to_str(lt.str_to_uuid("s")).alias("rt")).collect()
    assert back[0].rt == str(ids[0])
    assert back[1].rt == str(ids[1])  # case-insensitive parse, canonical out
    assert back[2].rt is None
    assert back[3].rt is None
    assert lt.py_uuid_bytes(str(ids[0])) == ids[0].bytes


def test_fixed_validation_modes(spark):
    df = spark.createDataFrame(
        [Row(b=b"12345678"), Row(b=b"short"), Row(b=None)]
    )
    assert df.select(lt.fixed_is_valid("b", 8).alias("v")).collect()[0].v is True
    assert lt.validate_fixed(df, "b", 8, on_bad="drop").count() == 2  # NULL kept
    nulled = lt.validate_fixed(df, "b", 8, on_bad="null").collect()
    assert [r.b for r in nulled] == [b"12345678", None, None]
    with pytest.raises(Exception, match="width violation"):
        lt.validate_fixed(df, "b", 8, on_bad="error").collect()
    ok = spark.createDataFrame([Row(b=b"12345678")])
    assert lt.validate_fixed(ok, "b", 8, on_bad="error").count() == 1


def test_lakehouse_roundtrip_with_dml(catalog, spark):
    """time/uuid/fixed columns through the lake: create, append, DML,
    read back — values and field metadata intact (extends the A2
    scan-type coverage to the reference's remaining logical types)."""
    schema = StructType(
        [
            lt.time_field("t"),
            lt.uuid_field("u"),
            lt.fixed_field("f", 4),
        ]
    )
    u1, u2 = uuid.UUID(int=1).bytes, uuid.UUID(int=2).bytes
    df = spark.createDataFrame(
        [(3_600_000_000, u1, b"AAAA"), (7_200_000_000, u2, b"BBBB"), (None, None, None)],
        schema,
    )
    tbl = catalog.create_table_as("db", "logical", df)
    back = tbl.read()
    assert {lt.logical_type_of(f) for f in back.schema.fields} == {
        "time",
        "uuid",
        "fixed[4]",
    }
    assert sorted(map(tuple, back.collect()), key=repr) == sorted(
        map(tuple, df.collect()), key=repr
    )
    # DML keyed on a uuid literal and a time comparison
    tbl.delete(F.col("u") == F.lit(lt.py_uuid_bytes(uuid.UUID(int=2))))
    assert tbl.read().count() == 2
    tbl.update(F.col("t") < 4_000_000_000, {"f": F.lit(b"CCCC")})
    rows = {bytes(r.u) if r.u else None: r.f for r in tbl.read().collect()}
    assert rows[u1] == b"CCCC"
