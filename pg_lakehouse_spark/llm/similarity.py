"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — broadcast the query set,
  one pass over the corpus, per-query heap via window. The baseline
  every ANN method is measured against; correct at any corpus size as
  long as the *query* side is broadcastable.
- ``lsh_ann_topk``: random-hyperplane LSH — corpus is bucketed by
  sign-bit signatures (deterministic seeded planes), queries probe
  their own bucket across several independent tables; exact cosine
  re-ranks only the collisions. This is the scale path: the full
  cross product never materializes.
- ``ivf_ann_topk``: IVF coarse quantization — distributed KMeans
  centroids partition the corpus; queries search their nprobe nearest
  cells. The other standard ANN scale path (FAISS-style), better than
  LSH when the corpus is clusterable.

Vector math uses built-in higher-order functions (zip_with/aggregate)
— JVM-side, no Python. For very wide vectors (≥1k dims) a Pandas-UDF
matmul over Arrow batches wins; that variant is in multimodal.py's
batch pattern.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def with_double_vec(df: DataFrame, vec_col: str, out: str = "__vec") -> DataFrame:
    """float→double once up front: IEEE-stable dot products."""
    return df.withColumn(
        out, F.transform(F.col(vec_col), lambda x: x.cast("double"))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine_sim, rank); self-matches
    (same id) are excluded. Ties break on neighbor id ascending.
    """
    query_id_col = query_id_col or id_col
    c = with_double_vec(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__vec").alias("__cv"),
        _norm(F.col("__vec")).alias("__cn"),
    )
    q = with_double_vec(queries, vec_col).select(
        F.col(query_id_col).alias("query_id"),
        F.col("__vec").alias("__qv"),
        _norm(F.col("__vec")).alias("__qn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(
                _dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def hyperplanes(dim: int, nbits: int, seed: int) -> list[list[float]]:
    """Deterministic gaussian hyperplanes (public LSH construction:
    Charikar SimHash for cosine distance)."""
    rng = np.random.RandomState(seed)
    return rng.normal(size=(nbits, dim)).tolist()


def _bucket_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of ``vec`` against each hyperplane → int."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(w)) for w in plane]),
                lambda x, p: x * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nbits: int = 8,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via multi-table hyperplane LSH.

    Each of ``num_tables`` independent tables buckets every vector by
    ``nbits`` sign bits (expected bucket occupancy N/2^nbits). A query
    only scores vectors sharing a bucket in ≥1 table. Recall rises
    with num_tables; cost stays ~num_tables·N/2^nbits per query vs N
    for brute force.
    """
    c = with_double_vec(corpus, vec_col)
    q = with_double_vec(queries, vec_col)
    c_buckets, q_buckets = [], []
    for t_i in range(num_tables):
        planes = hyperplanes(dim, nbits, seed + t_i)
        c_buckets.append(
            F.struct(
                F.lit(t_i).alias("tbl"), _bucket_bits(F.col("__vec"), planes).alias("b")
            )
        )
        q_buckets.append(
            F.struct(
                F.lit(t_i).alias("tbl"), _bucket_bits(F.col("__vec"), planes).alias("b")
            )
        )
    c2 = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__vec").alias("__cv"),
        _norm(F.col("__vec")).alias("__cn"),
        F.explode(F.array(*c_buckets)).alias("bb"),
    ).select("neighbor_id", "__cv", "__cn", "bb.tbl", "bb.b")
    q2 = q.select(
        F.col(id_col).alias("query_id"),
        F.col("__vec").alias("__qv"),
        _norm(F.col("__vec")).alias("__qn"),
        F.explode(F.array(*q_buckets)).alias("bb"),
    ).select("query_id", "__qv", "__qn", "bb.tbl", "bb.b")

    candidates = (
        c2.join(F.broadcast(q2), ["tbl", "b"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", "__qn", "__cv", "__cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.withColumn(
        "cosine_sim",
        F.round(
            _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 6
        ),
    ).select("query_id", "neighbor_id", "cosine_sim")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) partitioning.

    Train ``nlist`` coarse centroids with distributed KMeans (Spark ML,
    seeded), assign every corpus vector to its nearest centroid, and
    search each query only in its ``nprobe`` nearest centroid buckets.
    Per-query work drops from N to ~nprobe·N/nlist; recall rises with
    nprobe. Training is fully distributed; only the nlist centroid
    vectors (model metadata, not data) touch the driver.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = with_double_vec(corpus, vec_col)
    cv = c.withColumn("__mlvec", array_to_vector(F.col("__vec")))
    model = KMeans(
        k=nlist, seed=seed, featuresCol="__mlvec", predictionCol="__bucket"
    ).fit(cv)
    assigned = model.transform(cv).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__vec").alias("__cv"),
        _norm(F.col("__vec")).alias("__cn"),
        F.col("__bucket"),
    )

    centers = [
        (i, [float(x) for x in center])
        for i, center in enumerate(model.clusterCenters())
    ]
    spark = corpus.sparkSession
    centers_df = spark.createDataFrame(
        centers, "__bucket int, __center array<double>"
    )

    q = with_double_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec").alias("__qv"),
        _norm(F.col("__vec")).alias("__qn"),
    )
    # squared L2 distance query→centroid; keep the nprobe nearest
    dist = F.aggregate(
        F.zip_with(F.col("__qv"), F.col("__center"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.asc("__dist"), F.asc("__bucket")
    )
    probes = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn("__dist", dist)
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "__qv", "__qn", "__bucket")
    )

    candidates = assigned.join(F.broadcast(probes), "__bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = candidates.withColumn(
        "cosine_sim",
        F.round(
            _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 6
        ),
    ).select("query_id", "neighbor_id", "cosine_sim")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul.

    Same semantics as ``cosine_topk``; different execution: the query
    matrix is broadcast to every Python worker, each Arrow batch of
    corpus vectors becomes one ``(batch × dim) @ (dim × n_queries)``
    BLAS call, and only per-batch partial top-k rows leave Python.
    Wins over the JVM expression path when dims are wide (≥~1k) or
    n_queries is large — BLAS beats per-element codegen there.
    """
    import pandas as pd_
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField as SF_,
        StructType as ST_,
    )

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows])
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat, q_norm))

    out_schema = ST_(
        [
            SF_("query_id", LongType()),
            SF_("neighbor_id", LongType()),
            SF_("cosine_sim", DoubleType()),
        ]
    )

    def score(batches):
        ids, mat, norms = bq.value
        for pdf in batches:
            c_ids = pdf[id_col].to_numpy()
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            sims = (c_mat @ mat.T) / np.outer(c_norm, norms)
            n_q = len(ids)
            yield pd_.DataFrame(
                {
                    "query_id": np.repeat(ids, len(c_ids)),
                    "neighbor_id": np.tile(c_ids, n_q),
                    "cosine_sim": np.round(sims.T.ravel(), 6),
                }
            )

    scored = (
        corpus.select(id_col, vec_col)
        .mapInPandas(score, schema=out_schema)
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
