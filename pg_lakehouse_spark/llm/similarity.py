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


def _train_pq_codebooks(
    sample: np.ndarray, m_subvectors: int, ksub: int, seed: int, iters: int = 12
) -> np.ndarray:
    """Train PQ codebooks (Lloyd's k-means per subspace) on a bounded
    driver-side sample — the standard PQ practice (FAISS trains on a
    sample too); the sample size is fixed, not data-sized.

    Returns array (m, ksub, dsub).
    """
    n, dim = sample.shape
    dsub = dim // m_subvectors
    rng = np.random.RandomState(seed)
    books = np.empty((m_subvectors, ksub, dsub))
    for m in range(m_subvectors):
        sub = sample[:, m * dsub : (m + 1) * dsub]
        centers = sub[rng.choice(n, size=min(ksub, n), replace=False)]
        if len(centers) < ksub:  # degenerate tiny sample
            centers = np.vstack(
                [centers, rng.normal(size=(ksub - len(centers), dsub))]
            )
        for _ in range(iters):
            d2 = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(ksub):
                pts = sub[assign == c]
                if len(pts):
                    centers[c] = pts.mean(0)
        books[m] = centers
    return books


def ivfpq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    m_subvectors: int = 8,
    ksub: int = 16,
    train_sample: int = 16384,
    rerank_factor: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ with exact re-rank (FAISS IVFPQ-style, public method:
    Jégou et al., "Product Quantization for Nearest Neighbor Search").

    Scale path beyond plain IVF: within each probed cell, candidates
    are scored from ``m_subvectors``-byte PQ codes via per-query
    lookup tables (asymmetric distance computation) instead of full
    d-dim vectors — the scan touches codes (m bytes/vector), not
    embeddings (4d bytes/vector), a ~d·4/m compression of the hot
    loop. The top ``rerank_factor·k`` ADC candidates per query are
    then re-scored EXACTLY against their raw vectors, so returned
    cosine values equal brute-force values; only the candidate SET is
    approximate.

    Execution shape: coarse KMeans is distributed (Spark ML);
    codebooks train on a bounded driver-side sample; encode + ADC run
    as Arrow-batched numpy over ``mapInPandas`` (codebook lookups are
    fancy-indexing, not expressible in codegen); re-rank is a JVM-side
    expression join. Nothing data-sized ever reaches the driver.
    """
    import pandas as pd_
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField as SF_,
        StructType as ST_,
    )

    spark = corpus.sparkSession
    c = with_double_vec(corpus, vec_col)
    cv = c.withColumn("__mlvec", array_to_vector(F.col("__vec")))
    model = KMeans(
        k=nlist, seed=seed, featuresCol="__mlvec", predictionCol="__bucket"
    ).fit(cv)
    assigned = model.transform(cv).select(
        F.col(id_col).alias("neighbor_id"), F.col("__vec"), F.col("__bucket")
    )

    # --- train PQ codebooks on a deterministic bounded sample ---
    sample_rows = (
        c.select("__vec").sort(F.col(id_col)).limit(train_sample).collect()
    )
    sample = np.array([r["__vec"] for r in sample_rows], dtype=np.float64)
    books = _train_pq_codebooks(sample, m_subvectors, ksub, seed)
    book_sq = (books**2).sum(-1)  # (m, ksub) — for reconstructed norms
    sc = spark.sparkContext
    b_books = sc.broadcast((books, book_sq))

    dsub = sample.shape[1] // m_subvectors

    enc_schema = ST_(
        [
            SF_("neighbor_id", LongType()),
            SF_("__bucket", IntegerType()),
            SF_("codes", ArrayType(IntegerType())),
            SF_("recon_norm", DoubleType()),
        ]
    )

    def encode(batches):
        bks, bsq = b_books.value
        for pdf in batches:
            mat = np.array(list(pdf["__vec"]), dtype=np.float64)
            n = len(mat)
            codes = np.empty((n, m_subvectors), dtype=np.int32)
            for m in range(m_subvectors):
                sub = mat[:, m * dsub : (m + 1) * dsub]
                d2 = ((sub[:, None, :] - bks[m][None, :, :]) ** 2).sum(-1)
                codes[:, m] = d2.argmin(1)
            # subspaces are disjoint coordinates → ||recon||² is the
            # exact sum of chosen sub-centroid squared norms
            recon = np.sqrt(bsq[np.arange(m_subvectors)[None, :], codes].sum(1))
            yield pd_.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "__bucket": pdf["__bucket"].to_numpy(),
                    "codes": list(codes),
                    "recon_norm": recon,
                }
            )

    encoded = assigned.mapInPandas(encode, schema=enc_schema)

    # --- query→cell probes (same construction as ivf_ann_topk) ---
    centers = [
        (i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())
    ]
    centers_df = spark.createDataFrame(centers, "__bucket int, __center array<double>")
    q = with_double_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec").alias("__qv"),
        _norm(F.col("__vec")).alias("__qn"),
    )
    dist = F.aggregate(
        F.zip_with(F.col("__qv"), F.col("__center"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.asc("__dist"), F.asc("__bucket"))
    probes = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn("__dist", dist)
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "__bucket")
    )

    # broadcast the query matrix for LUT construction in the workers
    q_rows = q.select("query_id", "__qv", "__qn").collect()
    q_map = {
        int(r["query_id"]): (
            np.array(r["__qv"], dtype=np.float64),
            float(r["__qn"]),
        )
        for r in q_rows
    }
    b_q = sc.broadcast(q_map)

    adc_schema = ST_(
        [
            SF_("query_id", LongType()),
            SF_("neighbor_id", LongType()),
            SF_("adc_sim", DoubleType()),
        ]
    )

    def adc_score(batches):
        bks, _ = b_books.value
        qm = b_q.value
        luts: dict[int, tuple[np.ndarray, float]] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.reset_index(drop=True)
            codes = np.vstack(pdf["codes"])  # (n, m)
            recon = pdf["recon_norm"].to_numpy()
            nid = pdf["neighbor_id"].to_numpy()
            for qid, grp in pdf.groupby("query_id"):
                if qid not in luts:
                    qv, qn = qm[int(qid)]
                    # LUT[m, c] = <q_m, centroid_{m,c}> → ADC dot is a
                    # fancy-indexed sum over subspaces
                    lut = np.einsum(
                        "md,mkd->mk", qv.reshape(m_subvectors, dsub), bks
                    )
                    luts[int(qid)] = (lut, qn)
                lut, qn = luts[int(qid)]
                idx = grp.index.to_numpy()
                gcodes = codes[idx]
                adc_dot = lut[np.arange(m_subvectors)[None, :], gcodes].sum(1)
                denom = np.maximum(qn * recon[idx], 1e-12)
                yield pd_.DataFrame(
                    {
                        "query_id": np.full(len(idx), int(qid), dtype=np.int64),
                        "neighbor_id": nid[idx],
                        "adc_sim": adc_dot / denom,
                    }
                )

    candidates = (
        encoded.join(F.broadcast(probes), "__bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .mapInPandas(adc_score, schema=adc_schema)
    )
    aw = Window.partitionBy("query_id").orderBy(F.desc("adc_sim"), F.asc("neighbor_id"))
    shortlist = (
        candidates.withColumn("__r", F.row_number().over(aw))
        .filter(F.col("__r") <= rerank_factor * k)
        .select("query_id", "neighbor_id")
    )

    # --- exact re-rank: JVM expression join on the shortlist only ---
    cvecs = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__vec").alias("__cv"),
        _norm(F.col("__vec")).alias("__cn"),
    )
    qvecs = q.withColumnRenamed("__qv", "__qv2")
    rescored = (
        shortlist.join(cvecs, "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .withColumn(
            "cosine_sim",
            F.round(
                _dot(F.col("__qv2"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ann_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Corpus-to-corpus approximate nearest-neighbor JOIN: for every
    LEFT vector, its top-k cosine neighbors among the RIGHT vectors —
    retrieval at dataset scale (both sides big), e.g. match every
    training doc against a reference corpus.

    Same IVF shape as :func:`ivf_ann_topk`, but the probe side is
    corpus-sized, so candidates pair through a plain SHUFFLE equi-join
    on the coarse bucket — never a broadcast of either corpus; only
    the nlist centroids (model metadata) are broadcast. Work per left
    row is ~nprobe·|right|/nlist scoring ops; the bucket key is the
    shuffle key on both sides, so a hot centroid is the skew axis —
    raise nlist (finer cells) if one bucket dominates.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    r = with_double_vec(right, vec_col)
    rv = r.withColumn("__mlvec", array_to_vector(F.col("__vec")))
    model = KMeans(
        k=nlist, seed=seed, featuresCol="__mlvec", predictionCol="__bucket"
    ).fit(rv)
    assigned = model.transform(rv).select(
        F.col(right_id).alias("neighbor_id"),
        F.col("__vec").alias("__cv"),
        _norm(F.col("__vec")).alias("__cn"),
        F.col("__bucket"),
    )
    centers_df = right.sparkSession.createDataFrame(
        [
            (i, [float(x) for x in center])
            for i, center in enumerate(model.clusterCenters())
        ],
        "__bucket int, __center array<double>",
    )
    q = with_double_vec(left, vec_col).select(
        F.col(left_id).alias("query_id"),
        F.col("__vec").alias("__qv"),
        _norm(F.col("__vec")).alias("__qn"),
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("__qv"), F.col("__center"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.asc("__dist"), F.asc("__bucket")
    )
    probes = (
        q.crossJoin(F.broadcast(centers_df))  # centroids only — tiny
        .withColumn("__dist", dist)
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "__qv", "__qn", "__bucket")
    )
    # corpus × corpus: SHUFFLE join on the bucket key (no broadcast)
    candidates = assigned.join(probes, "__bucket")
    scored = candidates.withColumn(
        "cosine_sim",
        F.round(
            _dot(F.col("__qv"), F.col("__cv"))
            / (F.col("__qn") * F.col("__cn")),
            6,
        ),
    ).select("query_id", "neighbor_id", "cosine_sim")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)
