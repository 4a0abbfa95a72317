"""Round-11 battery: numeric(p,s) scale corners, to_char unknown-token
tail, misc string/numeric probes — engine vs DuckDB (DuckDB tracks PG
on these surfaces; known DuckDB divergences are hand-annotated).

Run: python scripts/battery_r11.py
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pg_lakehouse_spark import get_spark  # noqa: E402
from pg_lakehouse_spark.lakehouse import LakeCatalog  # noqa: E402
from pg_lakehouse_spark.sql import LakeSQL  # noqa: E402

spark = get_spark("battery-r11", cpus=4, shuffle_partitions=4)
lsql = LakeSQL(spark, LakeCatalog(spark, tempfile.mkdtemp(prefix="bat_")))
duck = duckdb.connect()

# (sql, expected) — expected None means "compare with DuckDB"
PROBES: list[tuple[str, object]] = [
    # numeric(p,s) scale rounding (PG: half-away at the scale edge)
    ("SELECT 2.567::numeric(10,2) AS x", None),
    ("SELECT 2.565::numeric(10,2) AS x", None),
    ("SELECT (-2.565)::numeric(10,2) AS x", None),
    ("SELECT 2.5::numeric(10,0) AS x", None),
    ("SELECT (-2.5)::numeric(10,0) AS x", None),
    ("SELECT 1.994999::numeric(6,2) AS x", None),
    ("SELECT 0.05::numeric(4,1) AS x", None),
    ("SELECT 123.456::numeric(6,1) AS x", None),
    # numeric→numeric widening keeps value
    ("SELECT 12.34::numeric(10,2)::numeric(12,4) AS x", None),
    # float→numeric
    ("SELECT (2.5::float8)::numeric(10,0) AS x", None),
    # int→numeric(p,s)
    ("SELECT 7::numeric(5,2) AS x", None),
    # division scale
    ("SELECT (10::numeric / 4)::numeric(10,2) AS x", None),
    # misc string fns
    ("SELECT substring('abcdef' from 2 for 3) AS x", "bcd"),
    ("SELECT position('cd' in 'abcdef') AS x", 3),
    ("SELECT overlay('abcdef' placing 'XY' from 2 for 3) AS x", "aXYef"),
    ("SELECT translate('12345', '143', 'ax') AS x", "a2x5"),
    ("SELECT repeat('ab', 3) AS x", "ababab"),
    ("SELECT ascii('A') AS x", 65),
    ("SELECT chr(66) AS x", "B"),
    ("SELECT md5('abc') AS x", "900150983cd24fb0d6963f7d28e17f72"),
    ("SELECT quote_ident('weird name') AS x", '"weird name"'),
    ("SELECT quote_literal($$O'Hara$$) AS x", "'O''Hara'"),
    ("SELECT concat_ws(',', 'a', NULL, 'b') AS x", "a,b"),
    ("SELECT format('%s-%s', 'a', 1) AS x", "a-1"),
    ("SELECT starts_with('alphabet', 'alph') AS x", True),
    ("SELECT split_part('a,b,c', ',', -1) AS x", "c"),
    ("SELECT btrim('xxhixx', 'x') AS x", "hi"),
    # numeric fns
    ("SELECT width_bucket(5.35, 0.024, 10.06, 5) AS x", 3),
    ("SELECT div(9, 4) AS x", 2),
    ("SELECT mod(9, 4) AS x", 1),
    ("SELECT gcd(12, 18) AS x", 6),
    ("SELECT lcm(4, 6) AS x", 12),
    ("SELECT factorial(5) AS x", 120),
    ("SELECT trunc(42.4382, 2) AS x", None),
    ("SELECT round(42.4382, 2) AS x", None),
    ("SELECT power(2, -1) AS x", 0.5),
    ("SELECT scale(8.4100) AS x", 4),
    ("SELECT min_scale(8.4100) AS x", 2),
    ("SELECT trim_scale(8.4100) AS x", None),
]

# to_char unknown tokens must stay LOUD (fall through unrewritten →
# Spark rejects), never silently wrong
LOUD = [
    "SELECT to_char(date '2024-01-15', 'J') AS x",
    "SELECT to_char(date '2024-01-15', 'CC') AS x",
    "SELECT to_char(date '2024-01-15', 'RM') AS x",
    "SELECT to_char(date '2024-01-15', 'IYYY') AS x",
    "SELECT to_char(interval '1 day', 'Day') AS x",
]

fails = 0
for sql, want in PROBES:
    try:
        got = lsql.sql(sql).collect()[0][0]
    except Exception as e:
        print(f"ENGINE-LOUD {sql!r}: {str(e).splitlines()[0][:120]}")
        fails += 1
        continue
    if want is None:
        try:
            want = duck.execute(sql.replace("::numeric", "::DECIMAL")
                                .replace("$$O'Hara$$", "'O''Hara'")
                                ).fetchone()[0]
        except Exception as e:
            print(f"DUCK-LOUD  {sql!r}: {str(e).splitlines()[0][:120]}")
            continue
    sg, sw = str(got), str(want)
    if sg != sw and repr(got) != repr(want):
        try:
            if float(got) == float(want):
                continue
        except Exception:
            pass
        print(f"DIFF {sql!r}: engine={got!r} expected={want!r}")
        fails += 1

for sql in LOUD:
    try:
        lsql.sql(sql).collect()
        print(f"SILENT (should be loud): {sql!r}")
        fails += 1
    except Exception:
        pass

print(f"\nbattery done, {fails} failures")
