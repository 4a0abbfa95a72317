"""Persisted ANN index over lakehouse tables.

Production ANN separates *build* (expensive, offline) from *query*
(cheap, repeated). This module persists an IVF index as two
snapshot-versioned lakehouse tables:

- ``<name>__centroids``   (bucket, center array<double>)      — tiny
- ``<name>__assignments`` (id, bucket, vec, norm)             — corpus-sized

so queries run against the stored index without re-clustering, index
rebuilds are atomic snapshot commits (readers never see a half-built
index), and time travel applies to the index like any other table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from pg_lakehouse_spark.lakehouse import LakeCatalog
from pg_lakehouse_spark.llm.similarity import _dot, _norm, with_double_vec


def build_ivf_index(
    catalog: LakeCatalog,
    namespace: str,
    name: str,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
) -> None:
    """Cluster the corpus and persist centroids + assignments.

    Rebuilding overwrites via new snapshots — queries running against
    the previous snapshot are unaffected (reader isolation for free
    from the lakehouse layer).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = with_double_vec(corpus, vec_col)
    cv = c.withColumn("__mlvec", array_to_vector(F.col("__vec")))
    model = KMeans(
        k=nlist, seed=seed, featuresCol="__mlvec", predictionCol="bucket"
    ).fit(cv)

    assignments = model.transform(cv).select(
        F.col(id_col).alias("id"),
        F.col("bucket"),
        F.col("__vec").alias("vec"),
        _norm(F.col("__vec")).alias("norm"),
    )
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        "bucket int, center array<double>",
    )

    for tbl_name, df in (
        (f"{name}__centroids", centroids),
        (f"{name}__assignments", assignments),
    ):
        if catalog.table_exists(namespace, tbl_name):
            catalog.load_table(namespace, tbl_name).overwrite(df)
        else:
            catalog.create_table_as(namespace, tbl_name, df)


def query_ivf_index(
    catalog: LakeCatalog,
    namespace: str,
    name: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    snapshot: int | None = None,
) -> DataFrame:
    """Top-k cosine neighbors from the persisted index. ``snapshot``
    pins an older index version (time-travel search)."""
    centroids = catalog.load_table(namespace, f"{name}__centroids").read(snapshot)
    assignments = catalog.load_table(namespace, f"{name}__assignments").read(snapshot)

    q = with_double_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec").alias("__qv"),
        _norm(F.col("__vec")).alias("__qn"),
    )
    dist = F.aggregate(
        F.zip_with(F.col("__qv"), F.col("center"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.asc("__dist"), F.asc("bucket"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("__dist", dist)
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "__qv", "__qn", "bucket")
    )
    scored = (
        assignments.join(F.broadcast(probes), "bucket")
        .filter(F.col("query_id") != F.col("id"))
        .withColumn(
            "cosine_sim",
            F.round(
                _dot(F.col("__qv"), F.col("vec")) / (F.col("__qn") * F.col("norm")),
                6,
            ),
        )
        .select("query_id", F.col("id").alias("neighbor_id"), "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def refresh_ivf_index(
    catalog: LakeCatalog,
    namespace: str,
    name: str,
    source,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
):
    """Advance the persisted index by the corpus table's delta.

    New vectors (append-only window since the stamped watermark) are
    assigned to their NEAREST EXISTING centroid — one broadcast
    cross-join with the tiny centroid table, cost ∝ new vectors — and
    appended to the assignments table in one atomic commit carrying
    the new watermark. Any non-append source history (or a missing
    watermark) falls back to a full rebuild + re-clustering.

    Incremental assignment reuses stale centroids by design (the
    standard serving-side trade): returns {'appended': n,
    'mean_sq_dist': d} so callers can trigger a rebuild when drift
    grows. Deletes require a rebuild (IVF assignments are not
    retracted here).
    """
    cur = source.current_version()

    def rebuild():
        build_ivf_index(
            catalog, namespace, name, source.read(),
            id_col=id_col, vec_col=vec_col, nlist=nlist, seed=seed,
        )
        at = catalog.load_table(namespace, f"{name}__assignments")
        at.set_properties({"ivf_source_version": str(cur)})
        return {"appended": None, "mean_sq_dist": None, "rebuilt": True}

    if not catalog.table_exists(namespace, f"{name}__assignments"):
        return rebuild()
    at = catalog.load_table(namespace, f"{name}__assignments")
    # watermark: newest summary stamp on the ref (appends stamp it
    # atomically with their commit), else the build-time property
    raw = None
    for v in at._ancestry(at.current_version()):
        sm = at.snapshot(v).summary or {}
        if "ivf_source_version" in sm:
            raw = sm["ivf_source_version"]
            break
    if raw is None:
        raw = at.snapshot().properties.get("ivf_source_version")
    if raw is None:
        return rebuild()
    last = int(raw)
    if cur <= last:
        return {"appended": 0, "mean_sq_dist": 0.0, "rebuilt": False}
    chain = source._ancestry(cur)
    window = [source.snapshot(v) for v in chain if last < v]
    if last not in (0, *chain) or any(
        s.operation != "append" for s in window
    ):
        return rebuild()

    new = source.read_incremental(last, cur)
    centroids = catalog.load_table(namespace, f"{name}__centroids").read()
    c = with_double_vec(new, vec_col)
    dist = F.aggregate(
        F.zip_with(
            F.col("__vec"), F.col("center"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("id").orderBy(F.asc("__dist"), F.asc("bucket"))
    assigned = (
        c.select(
            F.col(id_col).alias("id"),
            F.col("__vec"),
        )
        .crossJoin(F.broadcast(centroids))
        .withColumn("__dist", dist)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(
            "id", "bucket", F.col("__vec").alias("vec"),
            _norm(F.col("__vec")).alias("norm"),
            F.col("__dist"),
        )
    ).persist()
    stats = assigned.agg(
        F.count(F.lit(1)).alias("n"), F.avg("__dist").alias("d")
    ).collect()[0]
    at.append(
        assigned.drop("__dist"),
        summary_extra={
            "ivf_incremental_appended": int(stats.n),
            "ivf_source_version": str(cur),
        },
    )
    assigned.unpersist()
    return {
        "appended": int(stats.n),
        "mean_sq_dist": float(stats.d) if stats.d is not None else 0.0,
        "rebuilt": False,
    }
