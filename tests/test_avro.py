"""Pure-Python Avro OCF implementation (avro_io).

Reference parity: avro is one of the reference's three whitelisted
file formats (reference operations/table_ops.c:78-87). The container
lacks the spark-avro jar, so these tests exercise the public-spec
fallback end-to-end: full supported type surface, null/deflate codecs,
block framing, and a byte-level golden fixture encoded independently
of the reader under test.
"""

from __future__ import annotations

import datetime
import io
import json
import struct
import zlib
from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_lakehouse_spark import avro_io


TYPED_SCHEMA = T.StructType(
    [
        T.StructField("b", T.BooleanType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("l", T.LongType()),
        T.StructField("f", T.FloatType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("bin", T.BinaryType()),
        T.StructField("dt", T.DateType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("dec", T.DecimalType(12, 3)),
        T.StructField("arr", T.ArrayType(T.LongType())),
        T.StructField("m", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField(
            "st",
            T.StructType(
                [
                    T.StructField("x", T.LongType()),
                    T.StructField("y", T.StringType()),
                ]
            ),
        ),
    ]
)

ROWS = [
    {
        "b": True,
        "i": -42,
        "l": 2**40,
        "f": 1.5,
        "d": -2.25,
        "s": "héllo ☃",
        "bin": b"\x00\xff",
        "dt": datetime.date(2024, 2, 29),
        "ts": datetime.datetime(2024, 2, 29, 12, 34, 56, 789000),
        "dec": Decimal("12345.678"),
        "arr": [1, 2, 3],
        "m": {"a": 1.0, "b": -0.5},
        "st": {"x": 7, "y": "inner"},
    },
    {
        "b": None,
        "i": None,
        "l": None,
        "f": None,
        "d": None,
        "s": None,
        "bin": None,
        "dt": None,
        "ts": None,
        "dec": None,
        "arr": None,
        "m": None,
        "st": None,
    },
    {
        "b": False,
        "i": 0,
        "l": -1,
        "f": 0.0,
        "d": 1e300,
        "s": "",
        "bin": b"",
        "dt": datetime.date(1969, 12, 31),
        "ts": datetime.datetime(1969, 12, 31, 23, 59, 59),
        "dec": Decimal("-0.001"),
        "arr": [],
        "m": {},
        "st": {"x": None, "y": None},
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_all_types(codec):
    raw = avro_io.encode_container(ROWS, TYPED_SCHEMA, codec=codec)
    back = list(avro_io.decode_container(raw))
    assert len(back) == len(ROWS)
    for orig, got in zip(ROWS, back):
        for k, v in orig.items():
            g = got[k]
            if isinstance(v, float):
                assert abs(g - v) < 1e-6, k
            else:
                assert g == v, (k, v, g)


def test_schema_mapping_roundtrip():
    avro = avro_io.spark_to_avro_schema(TYPED_SCHEMA)
    back = avro_io.avro_to_spark_schema(avro)
    assert [f.dataType for f in back.fields] == [
        f.dataType for f in TYPED_SCHEMA.fields
    ]
    assert all(f.nullable for f in back.fields)


def test_golden_fixture_bytes():
    """Decode an OCF assembled by hand (independent encoder): one
    null-codec block of two {id: long, name: [null,string]} records."""

    def zz(n: int) -> bytes:
        z = (n << 1) ^ (n >> 63)
        out = b""
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out += bytes((b | 0x80,))
            else:
                return out + bytes((b,))

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
        ],
    }
    sj = json.dumps(schema).encode()
    sync = bytes(range(16))
    # records: (7, "ok"), (9, null)
    rec = zz(7) + zz(1) + zz(2) + b"ok" + zz(9) + zz(0)
    raw = (
        b"Obj\x01"
        + zz(2)
        + zz(11) + b"avro.schema" + zz(len(sj)) + sj
        + zz(10) + b"avro.codec" + zz(4) + b"null"
        + zz(0)
        + sync
        + zz(2) + zz(len(rec)) + rec + sync
    )
    rows = list(avro_io.decode_container(raw))
    assert rows == [{"id": 7, "name": "ok"}, {"id": 9, "name": None}]


def test_spark_write_read_distributed(spark, tmp_path):
    path = str(tmp_path / "events_avro")
    df = spark.createDataFrame(
        [Row(id=i, grp=i % 3, val=float(i) / 7, tag=f"t{i % 5}") for i in range(500)]
    ).repartition(4)
    nfiles = avro_io.write_avro(df, path)
    assert nfiles == 4
    back = avro_io.read_avro(spark, path)
    assert back.count() == 500
    # aggregation over the decoded frame matches the source
    a = df.groupBy("grp").agg(F.sum("id").alias("s")).collect()
    b = back.groupBy("grp").agg(F.sum("id").alias("s")).collect()
    assert sorted((r.grp, r.s) for r in a) == sorted((r.grp, r.s) for r in b)


def test_write_modes(spark, tmp_path):
    path = str(tmp_path / "modes")
    df = spark.range(10)
    avro_io.write_avro(df, path)
    with pytest.raises(FileExistsError):
        avro_io.write_avro(df, path, mode="error")
    avro_io.write_avro(spark.range(3), path, mode="overwrite")
    assert avro_io.read_avro(spark, path).count() == 3


def test_deflate_is_default_and_smaller(spark):
    rows = [{"s": "abc" * 50, "n": i} for i in range(200)]
    schema = T.StructType(
        [T.StructField("s", T.StringType()), T.StructField("n", T.LongType())]
    )
    null_raw = avro_io.encode_container(rows, schema, codec="null")
    defl_raw = avro_io.encode_container(rows, schema, codec="deflate")
    assert len(defl_raw) < len(null_raw) / 2
    assert list(avro_io.decode_container(defl_raw)) == list(
        avro_io.decode_container(null_raw)
    )


# ---------------------------------------------------------------------------
# property-based: arbitrary values round-trip the pure-Python codec
# (no Spark needed — encode/decode are plain functions)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_PROP_SCHEMA = T.StructType(
    [
        T.StructField("l", T.LongType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("bin", T.BinaryType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
        T.StructField("m", T.MapType(T.StringType(), T.LongType())),
    ]
)

_row = st.fixed_dictionaries(
    {
        "l": st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
        "d": st.one_of(
            st.none(),
            st.floats(allow_nan=False, allow_infinity=True, width=64),
        ),
        "s": st.one_of(st.none(), st.text(max_size=40)),
        "bin": st.one_of(st.none(), st.binary(max_size=40)),
        "arr": st.one_of(
            st.none(), st.lists(st.integers(-(2**40), 2**40), max_size=8)
        ),
        "m": st.one_of(
            st.none(),
            st.dictionaries(
                st.text(max_size=8), st.integers(-(2**40), 2**40), max_size=6
            ),
        ),
    }
)


@settings(max_examples=200, deadline=None)
@given(rows=st.lists(_row, max_size=20), codec=st.sampled_from(["null", "deflate"]))
def test_property_container_roundtrip(rows, codec):
    raw = avro_io.encode_container(rows, _PROP_SCHEMA, codec=codec)
    back = list(avro_io.decode_container(raw))
    assert back == rows


@settings(max_examples=100, deadline=None)
@given(n=st.integers(-(2**63), 2**63 - 1))
def test_property_zigzag_varint_roundtrip(n):
    buf = io.BytesIO()
    avro_io._write_long(buf, n)
    buf.seek(0)
    assert avro_io._read_long(buf) == n


def test_write_modes_append_ignore(spark, tmp_path):
    path = str(tmp_path / "modes2")
    avro_io.write_avro(spark.range(10), path)
    # append adds files under unique names instead of clobbering
    avro_io.write_avro(spark.range(5), path, mode="append")
    assert avro_io.read_avro(spark, path).count() == 15
    # ignore is a no-op when the target exists
    avro_io.write_avro(spark.range(99), path, mode="ignore")
    assert avro_io.read_avro(spark, path).count() == 15
    with pytest.raises(ValueError, match="unsupported write mode"):
        avro_io.write_avro(spark.range(1), path, mode="bogus")


def test_count_rows_matches_data(spark, tmp_path):
    path = str(tmp_path / "counted")
    avro_io.write_avro(spark.range(1234).repartition(3), path)
    import glob as _glob

    files = _glob.glob(path + "/*.avro")
    assert sum(avro_io.count_rows(f) for f in files) == 1234
