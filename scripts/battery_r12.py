"""Round-12 battery: composite/record semantics beyond ::text (row
comparison, row IN), reflection functions with cast-adorned args, the
JSON-editor loud set, regexp_* (PG 15) kit, and a misc sweep of
string/numeric/date corners — engine vs DuckDB where DuckDB tracks PG,
hand-pinned PG expectations elsewhere.

Run: python scripts/battery_r12.py
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

spark = get_spark("battery-r12", cpus=4, shuffle_partitions=4)
lsql = LakeSQL(spark, LakeCatalog(spark, tempfile.mkdtemp(prefix="bat_")))
duck = duckdb.connect()

# (sql, expected) — expected None means "compare with DuckDB"
PROBES: list[tuple[str, object]] = [
    # --- row/composite comparison semantics (PG row_compare) ---
    ("SELECT (1, 2) < (1, 3) AS x", True),
    ("SELECT (1, 2) < (2, 0) AS x", True),
    ("SELECT (2, 0) < (1, 9) AS x", False),
    ("SELECT (1, 2) = (1, 2) AS x", True),
    ("SELECT (1, 2) <> (1, 3) AS x", True),
    ("SELECT (1, 2) >= (1, 2) AS x", True),
    # NULL pair: = is NULL when undecided, ordering decided by an
    # earlier strict pair
    ("SELECT ((1, NULL) = (1, 2)) IS NULL AS x", True),
    ("SELECT (0, NULL) < (1, 2) AS x", True),
    # row IN a row list
    ("SELECT (1, 2) IN ((1, 2), (3, 4)) AS x", True),
    ("SELECT (1, 5) IN ((1, 2), (3, 4)) AS x", False),
    # --- GREATEST/LEAST ignore NULLs (PG) ---
    ("SELECT greatest(1, NULL, 3) AS x", 3),
    ("SELECT least(NULL, 2, NULL) AS x", 2),
    ("SELECT greatest(NULL, NULL) IS NULL AS x", True),
    # --- IS DISTINCT FROM 3VL ---
    ("SELECT 1 IS DISTINCT FROM NULL AS x", True),
    ("SELECT NULL IS NOT DISTINCT FROM NULL AS x", True),
    # --- regexp kit (PG 15 names; Spark shares them) ---
    ("SELECT regexp_count('abcabc', 'a') AS x", 2),
    ("SELECT regexp_like('abc', '^a') AS x", True),
    ("SELECT regexp_substr('ab12cd', '[0-9]+') AS x", "12"),
    ("SELECT regexp_instr('ab12cd', '[0-9]+') AS x", 3),
    ("SELECT regexp_count('aAaA', 'a', 1, 'i') AS x", 4),
    # --- string corners ---
    ("SELECT left('alphabet', -3) AS x", "alpha"),
    ("SELECT right('alphabet', -3) AS x", "habet"),
    ("SELECT lpad('abc', 2) AS x", "ab"),
    ("SELECT repeat('ab', 0) AS x", ""),
    ("SELECT trim(both 'x' from 'xaxx') AS x", "a"),
    ("SELECT trim(leading 'x' from 'xax') AS x", "ax"),
    ("SELECT substring('abcdef' from 3) AS x", "cdef"),
    ("SELECT reverse('abc') AS x", "cba"),
    ("SELECT initcap('hello wORLD') AS x", "Hello World"),
    # C-locale order: 'B'(66) sorts before 'a'(97)
    ("SELECT 'a' < 'B' AS x", False),
    ("SELECT 'Z' < 'a' AS x", True),
    # --- numeric corners ---
    ("SELECT round(1234.5, -2) AS x", None),
    ("SELECT mod(-9, 4) AS x", -1),
    ("SELECT div(-9, 4) AS x", -2),
    ("SELECT 0.1 + 0.2 = 0.3 AS x", True),
    ("SELECT abs(-2.5) AS x", None),
    ("SELECT sign(-0.5) AS x", None),
    ("SELECT ceil(-2.5) AS x", None),
    ("SELECT floor(-2.5) AS x", None),
    ("SELECT 'Infinity'::float8 > 1e300 AS x", True),
    ("SELECT exp(0) AS x", 1.0),
    ("SELECT cbrt(27.0) AS x", 3.0),
    ("SELECT trunc(-42.8) AS x", None),
    # --- date/time corners ---
    ("SELECT date '2024-01-31' + 1 AS x", None),
    ("SELECT date '2024-03-01' - date '2024-02-01' AS x", 29),
    ("SELECT extract(isoyear from date '2024-01-01') AS x", 2024),
    ("SELECT extract(isoyear from date '2023-01-01') AS x", 2022),
    ("SELECT date_trunc('week', date '2024-01-07')::date::text AS x",
     "2024-01-01"),
    ("SELECT to_date('2024-366', 'YYYY-DDD')::text AS x", "2024-12-31"),
    ("SELECT make_interval(weeks => 1)::text AS x", "7 days"),
    ("SELECT (interval '1 day') * 2 = interval '48 hours' AS x", True),
    ("SELECT extract(epoch from interval '90 seconds') AS x", 90),
    ("SELECT date_part('epoch', timestamp '1970-01-01 00:01:00') AS x",
     60.0),
    ("SELECT (timestamp '2024-01-02 03:00:00' - "
     "timestamp '2024-01-01 00:00:00')::text AS x", "1 day 03:00:00"),
    ("SELECT to_timestamp(86400)::date::text AS x", "1970-01-02"),
    ("SELECT isfinite(date '2024-01-01') AS x", True),
    # --- array corners ---
    ("SELECT array_position(array[3, 5, 3], 3) AS x", 1),
    ("SELECT (array[1,2,3])[2:3] AS x", [2, 3]),
    ("SELECT (array[1,2,3])[0] IS NULL AS x", True),
    ("SELECT array_length(array[1,2,3], 1) AS x", 3),
    ("SELECT cardinality(array[]::int[]) AS x", 0),
    ("SELECT array[1,2] || array[]::int[] AS x", [1, 2]),
    ("SELECT array_remove(array[1,2,1], 1) AS x", [2]),
    # --- json read surface stays green ---
    ("""SELECT '{"a":[1,2]}'::jsonb -> 'a' ->> 1 AS x""", "2"),
    ("""SELECT '{"a":1}'::jsonb ? 'a' AS x""", True),
    ("""SELECT json_array_length('[1,2,3]') AS x""", 3),
    # --- sequence reflection with plain args keeps working ---
    # (cast-adorned args probed in LOUD below)
]

# shapes that must stay LOUD (raise), never silently wrong
LOUD = [
    # JSON editors: string splicing cannot do these faithfully
    ("""SELECT jsonb_set('{"a":1}'::jsonb, '{a}', '2') AS x"""),
    ("""SELECT jsonb_insert('{"a":1}'::jsonb, '{b}', '2') AS x"""),
    ("""SELECT jsonb_strip_nulls('{"a":null}'::jsonb) AS x"""),
    ("""SELECT row_to_json(row(1, 'a')) AS x"""),
    ("""SELECT jsonb_path_query('{"a":1}'::jsonb, '$.a') AS x"""),
    # reflection with cast-adorned arguments
    ("SELECT pg_get_serial_sequence('app.t'::regclass::text, 'id') AS x"),
    # money / bit-string types are out of scope — loud
    ("SELECT '12.34'::money AS x"),
    ("SELECT B'1010' AS x"),
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
            want = duck.execute(sql).fetchone()[0]
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
        if isinstance(got, list) and list(got) == list(want):
            continue
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
