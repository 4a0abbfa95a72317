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

    # assignments are merge-on-read keyed by id: corpus deletes land as
    # equality-delete tombstones (refresh_ivf_index) instead of forcing
    # a rebuild, and reads anti-join them automatically
    mor_props = {"row_key": "id", "write_delete_mode": "merge-on-read"}
    for tbl_name, df, props in (
        (f"{name}__centroids", centroids, None),
        (f"{name}__assignments", assignments, mor_props),
    ):
        if catalog.table_exists(namespace, tbl_name):
            t = catalog.load_table(namespace, tbl_name)
            if props:
                t.set_properties(props)
            t.overwrite(df)
        else:
            catalog.create_table_as(
                namespace, tbl_name, df, properties=props
            )


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

    The source's row-level change feed (``read_changes``) drives the
    refresh, cost ∝ delta in every direction:

    - inserted / updated vectors assign to their NEAREST EXISTING
      centroid (one broadcast join with the tiny centroid table) and
      append with the new watermark in one atomic commit;
    - deleted / replaced vector ids land as equality-delete TOMBSTONES
      in the assignments table (``delete_by_keys``, O(keys), no corpus
      scan) — queries anti-join them automatically through the
      merge-on-read read path, and ``maybe_compact`` folds piled-up
      tombstones back into data files (GC).

    Corpus DML therefore no longer forces a rebuild (r3 verdict item);
    a full rebuild + re-clustering happens only for overwrite/truncate
    history, DML on a source without ``change_data_feed``, or a
    missing/foreign watermark. Incremental assignment reuses stale
    centroids by design (the standard serving-side trade): the
    returned ``mean_sq_dist`` lets callers trigger a rebuild when
    drift grows.
    """
    from pg_lakehouse_spark.lakehouse import LakehouseError

    cur = source.current_version()

    def rebuild():
        build_ivf_index(
            catalog, namespace, name, source.read(),
            id_col=id_col, vec_col=vec_col, nlist=nlist, seed=seed,
        )
        at = catalog.load_table(namespace, f"{name}__assignments")
        at.set_properties({"ivf_source_version": str(cur)})
        return {
            "appended": None, "removed": None,
            "mean_sq_dist": None, "rebuilt": True,
        }

    if not catalog.table_exists(namespace, f"{name}__assignments"):
        return rebuild()
    at = catalog.load_table(namespace, f"{name}__assignments")
    # watermark: newest summary stamp on the ref (refresh commits stamp
    # it atomically), else the build-time property
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
        return {
            "appended": 0, "removed": 0,
            "mean_sq_dist": 0.0, "rebuilt": False,
        }
    chain = source._ancestry(cur)
    if last not in (0, *chain):
        return rebuild()
    window = [source.snapshot(v) for v in chain if last < v]
    # compact/evolve produce no logical changes; overwrite/truncate
    # replace the corpus wholesale — re-cluster
    if any(
        s.operation not in ("append", "delete", "update", "merge", "compact")
        for s in window
    ):
        return rebuild()
    try:
        ch = source.read_changes(last, cur)
    except LakehouseError:
        return rebuild()  # DML history without a change feed

    # net effect per id across the window: the newest change wins; an
    # update's postimage outranks its preimage at the same version
    alive = F.col("_change_type").isin("insert", "update_postimage")
    w_id = Window.partitionBy(id_col).orderBy(
        F.desc("_commit_version"), F.desc("__alive")
    )
    ranked = (
        ch.withColumn("__alive", alive)
        .withColumn("__rn", F.row_number().over(w_id))
        .filter(F.col("__rn") == 1)
    ).persist()
    removed = 0
    if any(
        s.operation in ("delete", "update", "merge") for s in window
    ):
        # tombstone EVERY changed id: dead ids retire, and re-inserted
        # (updated) ids retire their OLD assignment row before the new
        # one appends with a higher (exempt) sequence number
        if "row_key" not in at.snapshot().properties:
            at.set_properties(
                {"row_key": "id", "write_delete_mode": "merge-on-read"}
            )
        at.delete_by_keys(ch.select(F.col(id_col).alias("id")).distinct())
        removed = ranked.filter(~F.col("__alive")).count()

    centroids = catalog.load_table(namespace, f"{name}__centroids").read()
    c = with_double_vec(ranked.filter(F.col("__alive")), vec_col)
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
    # the append stamps the watermark even for delete-only windows
    # (0 appended rows still commit the new ivf_source_version)
    at.append(
        assigned.drop("__dist"),
        summary_extra={
            "ivf_incremental_appended": int(stats.n),
            "ivf_removed_keys": int(removed),
            "ivf_source_version": str(cur),
        },
    )
    assigned.unpersist()
    ranked.unpersist()
    # GC: once tombstone delete-files pile past the threshold, fold
    # them into rewritten data files and retire them
    at.maybe_compact()
    return {
        "appended": int(stats.n),
        "removed": int(removed),
        "mean_sq_dist": float(stats.d) if stats.d is not None else 0.0,
        "rebuilt": False,
    }
