"""PG-compatible scalar function kit.

The reference's users write PostgreSQL SQL; a user switching to this
engine keeps their vocabulary: each helper here is a PG-named function
expressed as a *built-in* Spark Column expression (JVM, codegen — no
UDFs). Covers the PG functions whose Spark spelling differs; functions
whose names already match (upper, lower, abs, coalesce, …) need no
wrapper.
"""

from pg_lakehouse_spark.functions.pg import (
    age_days,
    date_part,
    date_trunc,
    left_,
    position,
    regexp_matches,
    right_,
    split_part,
    string_agg,
    strpos,
    substr,
    to_char_date,
)

__all__ = [
    "date_part",
    "date_trunc",
    "split_part",
    "strpos",
    "position",
    "substr",
    "left_",
    "right_",
    "age_days",
    "to_char_date",
    "regexp_matches",
    "string_agg",
]
