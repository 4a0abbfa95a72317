"""Keyword search over document corpora: inverted term statistics and
BM25 ranking.

The retrieval-side complement of the dedup/similarity tier: term
frequencies, document frequencies, and Okapi BM25 scoring as pure
DataFrame pipelines — explode + hash aggregates + an equi-join on the
query's terms, no Python in the hot path.

Scale shape: the postings relation (doc, term, tf) is ONE explode +
one hash agg over the corpus; document frequencies are a second agg
over postings (not the corpus); a query touches only the postings of
its own terms (equi-join on term, broadcast of the query term list).
At 100 TB the postings table is the thing you persist as a lake table
and incrementally maintain — build_postings returns exactly that
shape.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pg_lakehouse_spark.llm.text import words


def build_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Postings: one row per (doc, term) with the term frequency, plus
    the document length — the inverted-index fact table."""
    toks = df.select(
        F.col(id_col),
        F.explode(words(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    return (
        toks.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("dl", F.sum("tf").over(Window.partitionBy(id_col)))
    )


def term_stats(postings: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-term document frequency over a postings relation."""
    return postings.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )


def bm25_search(
    df: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k: score(q, d) = Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1−b+b·dl/avgdl)), idf = ln(1 + (N−df+0.5)/(df+0.5)).

    The query's terms are a broadcast literal list; only their
    postings join (equi-join on term), so cost ∝ the query terms'
    posting lists — never the corpus. Returns (id, score, rank) for
    the top k, deterministic tie-break on id.
    """
    q_terms = sorted(
        {t for t in query.lower().split() if t}
    )
    if not q_terms:
        raise ValueError("empty query")
    post = build_postings(df, id_col, text_col)
    n_docs = df.count()  # one scalar; cache postings upstream at scale
    avgdl = (
        post.select(id_col, "dl").distinct().agg(F.avg("dl")).collect()[0][0]
    )
    stats = term_stats(post, id_col)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    matched = (
        post.filter(F.col("term").isin(q_terms))
        .join(F.broadcast(stats.filter(F.col("term").isin(q_terms))), "term")
        .withColumn(
            "__contrib",
            idf
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.lit(float(avgdl)))
            ),
        )
    )
    scored = matched.groupBy(id_col).agg(
        F.sum("__contrib").alias("score"),
        F.count(F.lit(1)).alias("matched_terms"),
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("score"), F.asc(id_col))
        ),
    )
    # the single-partition ranking window only ever sees the scored
    # candidates of THIS query's terms (bounded); at cluster scale use
    # orderBy(...).limit(k) which plans TakeOrdered instead
    return ranked.filter(F.col("rank") <= k)


def idf_weight(n_docs: int, df_count: int) -> float:
    """Reference idf for tests: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return math.log(1.0 + (n_docs - df_count + 0.5) / (df_count + 0.5))


# -- persisted postings index -------------------------------------------------
# The search-index analog of the rollup tier: postings live in a
# snapshot-versioned lake table and advance by the CORPUS's change feed
# — new/updated documents re-tokenize (their postings replace), deleted
# documents' postings retract. Cost ∝ changed documents, never corpus
# size; the index itself is time-travelable like any lake table.


def create_postings_table(catalog, namespace: str, name: str, source,
                          id_col: str = "doc_id", text_col: str = "text"):
    """Build the postings index table from the corpus table's current
    snapshot and stamp the source-version watermark."""
    post = build_postings(source.read(), id_col, text_col)
    spec = {"id_col": id_col, "text_col": text_col}
    import json as _json

    tbl = catalog.create_table(
        namespace, name, post.schema,
        properties={"postings_spec": _json.dumps(spec),
                    "row_key": f"{id_col},term",
                    "write_delete_mode": "merge-on-read"},
    )
    tbl.append(
        post,
        summary_extra={"postings_source_version": source.current_version()},
    )
    return tbl


def refresh_postings(source, postings):
    """Advance the postings index by the corpus delta.

    Deleted / pre-update documents MERGE-retract their postings rows
    (merge-on-read: O(changed), no index rewrite); inserted /
    post-update documents append freshly-tokenized postings. Both land
    in ONE atomic transaction with the new watermark. Falls back to a
    full rebuild (overwrite) when the corpus can't serve a row-level
    change feed for the window."""
    import json as _json

    from pg_lakehouse_spark.lakehouse import LakehouseError, LakeTransaction

    spec = _json.loads(postings.snapshot().properties["postings_spec"])
    id_col, text_col = spec["id_col"], spec["text_col"]
    last = None
    for v in postings._ancestry(postings.current_version()):
        s = postings.snapshot(v).summary or {}
        if "postings_source_version" in s:
            last = int(s["postings_source_version"])
            break
    if last is None:
        raise LakehouseError("not a postings table: no watermark")
    cur = source.current_version()
    if cur <= last:
        return postings.snapshot()
    stamp = {"postings_source_version": cur}
    try:
        changes = source.read_changes(last, cur)
    except LakehouseError:
        changes = None
    if changes is None:
        return postings.overwrite(
            build_postings(source.read(), id_col, text_col),
            summary_extra=stamp,
        )
    touched = (
        changes.filter(F.col("_change_type") != "update_preimage")
        .select(id_col).distinct()
    )
    gone = (
        changes.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select(id_col).distinct()
    )
    fresh = build_postings(
        changes.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(id_col, text_col),
        id_col,
        text_col,
    )
    with LakeTransaction() as tx:
        # retract every touched doc's old postings (a doc may have
        # been deleted, or replaced by the fresh tokenization below)
        tx.merge(
            postings,
            gone.unionByName(touched).distinct(),
            on=[id_col],
            when_matched_update=None,
            when_matched_delete=True,
            when_not_matched_insert=False,
            summary_extra=dict(stamp),
        )
        tx.append(postings, fresh, summary_extra=dict(stamp))
    return postings.snapshot()
