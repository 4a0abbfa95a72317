"""PostgreSQL-named scalar functions as native Spark expressions.

Semantics follow PG (1-based positions, 0 on no-match for strpos,
etc.); everything compiles to built-in Catalyst expressions — the
whole kit is whole-stage-codegen-able, no Python at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DATE_PARTS = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "quarter": F.quarter,
    "week": F.weekofyear,
    "doy": F.dayofyear,
    "dow": lambda c: F.dayofweek(c) - 1,  # PG: Sunday=0; Spark: Sunday=1
}


def date_part(part: str, col: Column) -> Column:
    """PG date_part/EXTRACT → bigint (PG returns double/numeric; the
    integer parts are emitted as long for hash-stable comparisons)."""
    part = part.lower()
    if part not in _DATE_PARTS:
        raise ValueError(f"unsupported date_part {part!r}")
    return _DATE_PARTS[part](col).cast("long")


def date_trunc(part: str, col: Column) -> Column:
    """PG date_trunc — same name in Spark, argument order preserved."""
    return F.date_trunc(part, col)


def split_part(col: Column, delim: str, n: int) -> Column:
    """PG split_part: 1-based n-th field; '' when out of range."""
    return F.coalesce(
        F.try_element_at(F.split(col, _regex_escape(delim)), F.lit(n)), F.lit("")
    )


def strpos(col: Column, sub: str) -> Column:
    """PG strpos: 1-based position, 0 if absent."""
    return F.instr(col, sub).cast("long")


def position(sub: str, col: Column) -> Column:
    """PG position(sub IN str) — argument order differs from strpos."""
    return strpos(col, sub)


def substr(col: Column, start: int, length: int | None = None) -> Column:
    """PG substr — 1-based, optional length."""
    if length is None:
        return F.substring(col, start, 0x7FFFFFFF)
    return F.substring(col, start, length)


def left_(col: Column, n: int) -> Column:
    return F.substring(col, 1, n)


def right_(col: Column, n: int) -> Column:
    return F.substring(col, -n, n)


def age_days(a: Column, b: Column) -> Column:
    """days between timestamps (PG age() collapsed to day precision —
    PG's interval type has no Spark analog; days are the stable core)."""
    return F.datediff(a.cast("date"), b.cast("date")).cast("long")


def to_char_date(col: Column, pg_pattern: str) -> Column:
    """PG to_char for the common date patterns (YYYY/MM/DD/HH24/MI/SS)."""
    java = (
        pg_pattern.replace("YYYY", "yyyy")
        .replace("DD", "dd")
        .replace("HH24", "HH")
        .replace("MI", "mm")
        .replace("SS", "ss")
    )
    # PG 'MM' is month; Java 'MM' is month — only minute ('MI') differs,
    # handled above before this point.
    return F.date_format(col, java)


def regexp_matches(col: Column, pattern: str) -> Column:
    """PG regexp_matches existence-check form → boolean."""
    return col.rlike(pattern)


def string_agg(col: Column, delim: str, order: list[Column] | None = None) -> Column:
    """PG string_agg as an aggregate expression. Deterministic output
    requires an explicit order — pass ``order`` (PG's WITHIN GROUP /
    ORDER BY clause); without it results are partition-order dependent.

    Bounded-size caveat: per-group concatenation grows with group size —
    use only on bounded groups (same rule as collect_list, which this
    composes; exempted from the lint by explicit ordering + bounded use).
    """
    items = F.array_sort(F.collect_list(F.struct(*(order or [col]), col.alias("__v"))))
    return F.array_join(F.transform(items, lambda s: s.getField("__v")), delim)


def array_agg(col: Column, order: list[Column] | None = None) -> Column:
    """PG array_agg with deterministic ORDER BY (same bounded-group
    rule as string_agg)."""
    items = F.array_sort(
        F.collect_list(F.struct(*(order or [col]), col.alias("__v")))
    )
    return F.transform(items, lambda s: s.getField("__v"))


def width_bucket(
    col: Column, lo: float, hi: float, n: int
) -> Column:
    """PG width_bucket(operand, low, high, count): equal-width
    histogram bucket, 1-based; 0 below range, count+1 at/above high.
    Pure expression — codegen-able, the building block for histogram
    aggregations at any scale."""
    width = (hi - lo) / n
    return (
        F.when(col < lo, F.lit(0))
        .when(col >= hi, F.lit(n + 1))
        .otherwise(F.floor((col - F.lit(lo)) / F.lit(width)) + 1)
        .cast("long")
    )


def percentile_cont(col: Column, q: float) -> Column:
    """PG percentile_cont(q) WITHIN GROUP — exact continuous
    percentile (linear interpolation), Spark's exact `percentile`."""
    return F.percentile(col, F.lit(q))


def percentile_disc(col: Column, q: float) -> Column:
    """PG percentile_disc(q): smallest value whose cumulative
    distribution >= q. Composed from exact percentile over the
    discrete rank: index = ceil(q * n) in sorted order."""
    # array_sort(collect_list) is bounded-group only, like PG's own
    # ordered-set aggregate memory profile
    arr = F.array_sort(F.collect_list(col))
    n = F.size(arr)
    idx = F.greatest(F.ceil(F.lit(q) * n).cast("int"), F.lit(1))
    return F.get(arr, idx - 1)


def btrim(col: Column, chars: str | None = None) -> Column:
    """PG btrim: strip characters (default whitespace) from both
    ends — a two-anchor regexp, stays in codegen."""
    if chars is None:
        return F.trim(col)
    esc = "".join("\\" + c if c in r"\^]-[" else c for c in chars)
    return F.regexp_replace(col, f"^[{esc}]+|[{esc}]+$", "")


def quote_ident(col: Column) -> Column:
    """PG quote_ident: double-quote an identifier, doubling quotes."""
    return F.concat(
        F.lit('"'), F.regexp_replace(col, '"', '""'), F.lit('"')
    )


def quote_literal(col: Column) -> Column:
    """PG quote_literal: single-quote a string, doubling quotes."""
    return F.concat(
        F.lit("'"), F.regexp_replace(col, "'", "''"), F.lit("'")
    )


def format_pg(fmt: str, *cols: Column) -> Column:
    """PG format() for the %s form (its %I/%L forms compose from
    quote_ident/quote_literal)."""
    return F.format_string(fmt.replace("%s", "%s"), *cols)


def _regex_escape(s: str) -> str:
    out = []
    for ch in s:
        out.append("\\" + ch if ch in r"\.[]{}()*+?^$|" else ch)
    return "".join(out)
