"""User-defined function surface (SURVEY §2 Tier B last row):
row UDF, vectorized pandas UDF (scalar + grouped-agg), Python UDTF.

The engine stance: built-ins first (everything else in the workload is
JVM-side); these queries exist to prove the full UDF surface works and
to document the cost ladder — pandas UDFs (Arrow-batched) are the
sanctioned Python path, row UDFs are the measured-and-discouraged one.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pg_lakehouse_spark.workload import register
from pg_lakehouse_spark.workload.util import t


@register(
    "q_pandas_udf_normalize",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                           ' +', ' ', 'g')) AS norm_text
FROM documents
WHERE doc_id < 100
""",
    tags=("udf-pandas-scalar",),
)
def q_pandas_udf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized text normalization — one Arrow batch per task, pandas
    string kernels inside; the standard shape for Python text cleaning."""

    @pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:
        return (
            s.str.lower()
            .str.replace(r"[^a-z0-9 ]", "", regex=True)
            .str.replace(r" +", " ", regex=True)
            .str.strip()
        )

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select("doc_id", normalize(F.col("text")).alias("norm_text"))


@register(
    "q_pandas_udaf_grouped",
    oracle="""
SELECT source,
       CAST(sum(n_chars * doc_id) AS BIGINT) AS weighted_sum,
       count(*) AS n_docs
FROM documents
GROUP BY source
""",
    tags=("udf-pandas-agg",),
)
def q_pandas_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (integer math → exact, oracle-safe)."""

    @pandas_udf("long")
    def weighted_sum(chars: pd.Series, ids: pd.Series) -> int:
        return int((chars * ids).sum())

    @pandas_udf("long")
    def n_rows(ids: pd.Series) -> int:
        # pandas grouped-agg UDFs can't mix with JVM aggregates in one
        # agg() — count travels as a second pandas UDF
        return int(len(ids))

    docs = t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        weighted_sum("n_chars", "doc_id").alias("weighted_sum"),
        n_rows("doc_id").alias("n_docs"),
    )


@register(
    "q_python_udtf_bigrams",
    oracle="""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), bg AS (
  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bigram
  FROM ws WHERE len(w) >= 2
)
SELECT bigram, count(*) AS cnt
FROM bg
GROUP BY bigram
ORDER BY cnt DESC, bigram
LIMIT 30
""",
    tags=("udf-udtf",),
)
def q_python_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row → many output rows,
    lateral-joined. The UDTF yields word bigrams; the query ranks them."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram: string")
    class Bigrams:
        def eval(self, text: str):
            ws = text.split(" ")
            for a, b in zip(ws, ws[1:]):
                yield (f"{a} {b}",)

    spark.udtf.register("bigrams", Bigrams)
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT b.bigram, count(*) AS cnt
        FROM documents, LATERAL bigrams(text) b
        GROUP BY b.bigram
        ORDER BY cnt DESC, b.bigram
        LIMIT 30
        """
    )


@register(
    "q_python_udf_row",
    oracle="""
SELECT p_partkey, reverse(p_name) AS rev_name
FROM part WHERE p_partkey <= 100
""",
    tags=("udf-row",),
)
def q_python_udf_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — present for surface completeness;
    ~10-100× slower than built-ins/pandas UDFs, never used in engine
    hot paths (see plans lint + llm modules)."""
    rev = F.udf(lambda s: s[::-1] if s is not None else None, "string")
    part = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return part.select("p_partkey", rev(F.col("p_name")).alias("rev_name"))
