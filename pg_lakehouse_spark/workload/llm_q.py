"""LLM-pipeline workload (Tier C) — dedup, similarity, text analysis,
multimodal — over the documents/embeddings corpus tables.

Oracle policy: operators with engine-independent math (exact dedup,
exact Jaccard, brute-force cosine, text stats, the stub image decode)
get full DuckDB oracles. Sketch-based operators (MinHash/SimHash/LSH
buckets) hash with engine-specific functions and are registered
rows-only; their quality is asserted in tests/test_llm.py against the
exact operators instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_lakehouse_spark.llm.dedup import (
    dedup_exact,
    jaccard_near_duplicates,
    minhash_lsh_candidates,
    simhash_near_duplicates,
)
from pg_lakehouse_spark.llm.multimodal import decode_images, synthesize_media
from pg_lakehouse_spark.llm.similarity import cosine_topk, lsh_ann_topk
from pg_lakehouse_spark.llm.text import (
    add_quality_signals,
    language_id,
    minhash_fingerprint,
    token_count_bpe,
    token_count_ws,
)
from pg_lakehouse_spark.workload import register
from pg_lakehouse_spark.workload.util import t

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_documents",
    oracle="""
SELECT d.doc_id, d.lang, d.source
FROM documents d
JOIN (
  SELECT min(doc_id) AS doc_id
  FROM documents
  GROUP BY regexp_replace(lower(text), '\\s+', ' ', 'g')
) keep USING (doc_id)
""",
    tags=("dedup-exact",),
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    key = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return dedup_exact(docs, key, id_col="doc_id", keep="min").select(
        "doc_id", "lang", "source"
    )


_JACCARD_ORACLE = """
WITH words AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(ws) >= 3
         THEN [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]
         ELSE [array_to_string(ws, ' ')] END)) AS s
  FROM words
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id1, id2,
       round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON id1 = sa.doc_id
JOIN sizes sb ON id2 = sb.doc_id
WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
"""


@register("dedup_jaccard_pairs", oracle=_JACCARD_ORACLE, tags=("dedup-jaccard",))
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs via inverted index."""
    docs = t(spark, sf_dir, "documents")
    return jaccard_near_duplicates(
        docs, id_col="doc_id", text_col="text", n=3, threshold=0.5,
        max_shingle_df=None,
    )


@register("dedup_minhash_lsh", oracle=_JACCARD_ORACLE, tags=("dedup-minhash",))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates verified at exact Jaccard ≥ 0.5.

    Oracle-backed deliberately: at r=4/b=16 the detection probability
    for the ≥0.8-Jaccard pairs in this corpus is ~0.9997 per pair, and
    the pipeline is fully deterministic (seeded xxhash64) — its output
    equals the exact-Jaccard pair set, asserted independently at three
    scale factors in tests/test_llm.py. The same SQL oracle as
    dedup_jaccard_pairs therefore applies."""
    docs = t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        docs, id_col="doc_id", text_col="text",
        n=3, num_hashes=64, bands=16, verify_threshold=0.5,
    )


_CLUSTER_ORACLE = (
    "WITH RECURSIVE pairs AS (" + _JACCARD_ORACLE + "),"
    + """
sym AS (
  SELECT id1 AS a, id2 AS b FROM pairs
  UNION SELECT id2, id1 FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a
)
SELECT a AS doc_id, least(a, min(b)) AS component
FROM reach GROUP BY a
"""
)


@register(
    "dedup_jaccard_clusters",
    oracle=_CLUSTER_ORACLE,
    tags=("dedup-jaccard", "dedup-clusters"),
)
def dedup_jaccard_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> connected components: every document involved
    in a ≥0.5-Jaccard pair labeled with its cluster id (min doc_id of
    the component). The oracle computes the same transitive closure
    with a recursive CTE — feasible at sf0.01, while the Spark side
    (min-label propagation, one shuffle per round, bounded rounds) is
    the shape that survives billions of documents."""
    from pg_lakehouse_spark.llm.dedup import connected_components

    docs = t(spark, sf_dir, "documents")
    pairs = jaccard_near_duplicates(
        docs, id_col="doc_id", text_col="text", n=3, threshold=0.5,
        max_shingle_df=None,
    )
    comp = connected_components(pairs, "id1", "id2")
    return comp.select(
        F.col("node").alias("doc_id"), F.col("component")
    )


@register("dedup_simhash", oracle=None, tags=("dedup-simhash",))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return simhash_near_duplicates(
        docs, id_col="doc_id", text_col="text", n=2, max_hamming=3, bands=4
    )


@register(
    "dedup_embedding_pairs",
    oracle="""
WITH base AS (SELECT vec_id, embedding FROM embeddings),
dup AS (SELECT vec_id + 10000 AS vec_id, embedding FROM base
        WHERE vec_id % 5 = 0),
all_v AS (SELECT * FROM base UNION ALL SELECT * FROM dup)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos_sim
FROM all_v a JOIN all_v b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
""",
    tags=("dedup-embedding",),
)
def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection (exact face, oracle-checked):
    the corpus is salted with identical copies of every 5th vector
    (cosine exactly 1.0 — no float boundary risk; the corpus's natural
    pair max is ~0.51, far from the 0.95 threshold), and the operator
    must report exactly the planted pairs. The LSH-blocked scale path
    is proven equal to this exact face in test_llm.py."""
    from pg_lakehouse_spark.llm.dedup import embedding_near_duplicates

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    return embedding_near_duplicates(
        emb.unionByName(dup),
        id_col="vec_id",
        vec_col="embedding",
        threshold=0.95,
        method="exact",
    )


@register("text_fingerprint", oracle=None, tags=("fingerprint",))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 64-bit minhash fingerprint + exact-dup grouping on it."""
    docs = t(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", minhash_fingerprint(F.col("text"), n=3).alias("fingerprint")
    )
    counts = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("n_docs"))
    return fp.join(counts, "fingerprint").select("doc_id", "fingerprint", "n_docs")


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_token_stats",
    oracle="""
SELECT doc_id,
       CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens_ws,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
         AS n_tokens_bpe,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""",
    tags=("text-tokens",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_ws(F.col("text")).cast("long").alias("n_tokens_ws"),
        token_count_bpe(F.col("text")).cast("long").alias("n_tokens_bpe"),
        F.length("text").cast("long").alias("n_chars"),
    )


@register(
    "text_quality_signals",
    oracle="""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         regexp_split_to_array(lower(text), '\\s+') AS ws,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits
  FROM documents
), derived AS (
  SELECT doc_id, n_chars,
         CAST(len(ws) AS BIGINT) AS n_words,
         len(list_filter(ws, w -> list_contains(
           ['the','and','of','to','a','in','is','it','that','this','with','for','as','on'],
           w))) AS stop_hits,
         punct, digits
  FROM base
)
SELECT doc_id, n_chars, n_words,
       floor(CASE WHEN n_words > 0
                  THEN (n_chars - (n_words - 1)) * 1.0 / n_words
                  ELSE 0.0 END * 10000) / 10000 AS avg_word_len,
       floor(punct * 1.0 / greatest(n_chars, 1) * 10000) / 10000 AS punct_ratio,
       floor(digits * 1.0 / greatest(n_chars, 1) * 10000) / 10000 AS digit_ratio,
       floor(CASE WHEN n_words > 0 THEN stop_hits * 1.0 / n_words
                  ELSE 0.0 END * 10000) / 10000 AS stopword_ratio,
       floor((least(1.0, n_words / 50.0) * 0.4
             + (1 - least(1.0, floor(punct * 1.0 / greatest(n_chars, 1) * 10000) / 10000 * 10)) * 0.3
             + least(1.0, floor(CASE WHEN n_words > 0
                                     THEN stop_hits * 1.0 / n_words
                                     ELSE 0.0 END * 10000) / 10000 * 5) * 0.3) * 10000) / 10000
         AS quality_score
FROM derived
""",
    tags=("text-quality",),
)
def text_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return add_quality_signals(docs, "text").select(
        "doc_id",
        F.col("n_chars_calc").alias("n_chars"),
        "n_words",
        "avg_word_len",
        "punct_ratio",
        "digit_ratio",
        "stopword_ratio",
        "quality_score",
    )


@register(
    "text_lang_id",
    oracle="""
WITH hits AS (
  SELECT doc_id, lang AS lang_true,
    len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
        w -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], w))) AS h_de,
    len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
        w -> list_contains(['the','and','of','to','a','in','is','it'], w))) AS h_en,
    len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
        w -> list_contains(['el','la','los','que','de','y','es','un'], w))) AS h_es,
    len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
        w -> list_contains(['le','la','les','et','est','une','que','des'], w))) AS h_fr
  FROM documents
)
SELECT doc_id, lang_true,
       CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
            WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
            WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
            WHEN h_es >= h_fr THEN 'es'
            ELSE 'fr' END AS lang_pred,
       CAST(greatest(h_de, h_en, h_es, h_fr) AS BIGINT) AS lang_pred_hits
FROM hits
""",
    tags=("text-langid",),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return language_id(docs, "text").select(
        "doc_id", F.col("lang").alias("lang_true"), "lang_pred", "lang_pred_hits"
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_KNN_ORACLE = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(
           list_dot_product(CAST(q.embedding AS DOUBLE[]),
                            CAST(c.embedding AS DOUBLE[]))
           / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])))), 6)
           AS cosine_sim
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id) AS rn
  FROM scored
) x
WHERE rn <= 5
"""


@register("embed_knn_bruteforce", oracle=_KNN_ORACLE, tags=("similarity-knn",))
def embed_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for query vectors vec_id < 10."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(emb, queries, k=5, id_col="vec_id", vec_col="embedding")


@register("embed_knn_lsh", oracle=None, tags=("similarity-ann",))
def embed_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-5 (rows-only: bucket membership
    is seed-specific; recall vs brute force asserted in tests)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_ann_topk(
        emb, queries, k=5, id_col="vec_id", vec_col="embedding",
        dim=64, nbits=8, num_tables=4, seed=42,
    )


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


@register(
    "multimodal_decode",
    oracle="""
WITH sums AS (
  SELECT doc_id AS media_id,
         CAST(length(text) AS BIGINT) AS n,
         list_sum([ord(text[i]) for i in
                   range(1, least(64, length(text)) + 1)]) AS checksum
  FROM documents
)
SELECT media_id,
       CAST(64 + checksum % 192 AS INTEGER) AS width,
       CAST(64 + n % 192 AS INTEGER) AS height,
       CAST((checksum + n) % 256 AS INTEGER) AS mean_luma
FROM sums
""",
    tags=("multimodal",),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: synthesize payloads from text, decode
    via Arrow-batched mapInPandas (stub codec — deterministic, so the
    full plumbing is oracle-checkable; corpus text is ASCII, making
    byte sums == codepoint sums)."""
    docs = t(spark, sf_dir, "documents")
    media = synthesize_media(docs, "doc_id", "text")
    return decode_images(media)


@register(
    "multimodal_features",
    oracle="""
WITH sums AS (
  SELECT doc_id AS media_id,
         CAST(length(text) AS BIGINT) AS n,
         list_sum([ord(text[i]) for i in
                   range(1, least(64, length(text)) + 1)]) AS checksum
  FROM documents
)
SELECT media_id,
       round((checksum % 1009) / 1009.0, 6) AS f_first,
       round(((checksum * 16 + n * 15) % 1009) / 1009.0, 6) AS f_last,
       round(list_sum([((checksum * (i + 1) + n * i) % 1009) / 1009.0
                       for i in range(0, 16)]), 6) AS f_sum
FROM sums
""",
    tags=("multimodal", "feature-extract"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads (Arrow-batched
    mapInPandas; deterministic stub featurizer → oracle-checkable).
    The engine-side output keeps the full `array<double>` vector (the
    shape the similarity stack consumes); the ROW projects scalar
    probes of it — first/last element + sum — because the driver's
    pandas canonicalizer cannot sort array cells (r9, same contract
    rule as q_ordered_aggregates)."""
    from pg_lakehouse_spark.llm.multimodal import extract_features

    docs = t(spark, sf_dir, "documents")
    out = extract_features(synthesize_media(docs, "doc_id", "text"), dim=16)
    return out.select(
        "media_id",
        F.round(F.element_at("feature", 1), 6).alias("f_first"),
        F.round(F.element_at("feature", 16), 6).alias("f_last"),
        F.round(
            F.aggregate(
                "feature", F.lit(0.0), lambda acc, x: acc + x
            ),
            6,
        ).alias("f_sum"),
    )


@register(
    "multimodal_resize",
    oracle="""
WITH sums AS (
  SELECT doc_id AS media_id,
         CAST(length(text) AS BIGINT) AS n,
         list_sum([ord(text[i]) for i in
                   range(1, least(64, length(text)) + 1)]) AS checksum
  FROM documents
)
SELECT media_id,
       CAST(224 AS INTEGER) AS width, CAST(224 AS INTEGER) AS height,
       CAST(floor(224.0 / (64 + checksum % 192) * 10000 + 0.5) AS BIGINT)
         AS scale_x_e4,
       CAST(floor(224.0 / (64 + n % 192) * 10000 + 0.5) AS BIGINT)
         AS scale_y_e4,
       CAST(224 * 224 // 64 AS BIGINT) AS payload_bytes
FROM sums
""",
    tags=("multimodal", "resize"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: stub-decode source dims, emit target dims +
    e4-scaled scale factors + the resized payload (compared by length
    — byte content is engine-side only)."""
    from pg_lakehouse_spark.llm.multimodal import resize_images

    docs = t(spark, sf_dir, "documents")
    out = resize_images(
        synthesize_media(docs, "doc_id", "text"), target_w=224, target_h=224
    )
    return out.select(
        "media_id", "width", "height", "scale_x_e4", "scale_y_e4",
        F.length("payload").cast("long").alias("payload_bytes"),
    )


@register("embed_knn_ivf", oracle=None, tags=("similarity-ann-ivf",))
def embed_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned approximate top-5 (rows-only: centroids come
    from seeded KMeans; recall asserted in tests)."""
    from pg_lakehouse_spark.llm.similarity import ivf_ann_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_ann_topk(
        emb, queries, k=5, id_col="vec_id", vec_col="embedding",
        nlist=8, nprobe=3, seed=42,
    )


@register(
    "data_split_modulo",
    oracle="""
SELECT CASE WHEN doc_id % 10000 < 8000 THEN 'train'
            WHEN doc_id % 10000 < 9000 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
""",
    tags=("split",),
)
def data_split_modulo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (oracle-checkable modulo
    variant; hash_split is the production twin below)."""
    from pg_lakehouse_spark.llm.splits import modulo_split

    docs = t(spark, sf_dir, "documents")
    return (
        modulo_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@register("data_split_hash", oracle=None, tags=("split",))
def data_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash split (rows-only: xxhash64 is engine-specific;
    ratio correctness asserted in tests)."""
    from pg_lakehouse_spark.llm.splits import hash_split

    docs = t(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register("embed_knn_ivfpq", oracle=None, tags=("similarity-ann-ivfpq",))
def embed_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-5 with exact re-rank (rows-only:
    candidate sets are seed-specific; recall + exact-re-rank property
    asserted in tests). The scale path when even raw-vector scans of
    probed cells are too hot: candidates score from m-byte PQ codes."""
    from pg_lakehouse_spark.llm.similarity import ivfpq_ann_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivfpq_ann_topk(
        emb, queries, k=5, id_col="vec_id", vec_col="embedding",
        nlist=8, nprobe=3, m_subvectors=8, ksub=16, seed=42,
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

_DECONTAM_ORACLE = """
WITH words AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(ws) >= 3
         THEN [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]
         ELSE [array_to_string(ws, ' ')] END)) AS s
  FROM words
),
bench AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id % 97 = 0),
train AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0)
SELECT t.doc_id, b.bench_id, count(*) AS n_overlap
FROM train t JOIN bench b ON t.s = b.s
GROUP BY 1, 2
HAVING count(*) >= 2
"""


@register(
    "decontaminate_overlap",
    oracle=_DECONTAM_ORACLE,
    tags=("decontamination", "ngram"),
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 97th document plays the
    benchmark set; training docs sharing ≥2 distinct 3-gram shingles
    with a benchmark doc are flagged with their overlap count. The
    benchmark side broadcasts — the corpus is scanned once."""
    from pg_lakehouse_spark.llm.decontaminate import ngram_overlap

    docs = t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return ngram_overlap(
        train, bench, n=3, min_overlap=2,
        id_col="doc_id", text_col="text",
        bench_id_col="bench_id", bench_text_col="text",
    )


# ---------------------------------------------------------------------------
# Training-sample assembly + data-quality scrubbing
# ---------------------------------------------------------------------------


@register(
    "text_chunking",
    oracle="""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws
  FROM documents
), c AS (
  SELECT doc_id, ws,
         greatest(1, CAST(ceil((len(ws) - 32) * 1.0 / 24) AS INT) + 1) AS nc
  FROM base
), x AS (
  SELECT doc_id, ws, unnest(range(0, nc)) AS i FROM c
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_id,
       array_to_string(list_slice(ws, i*24 + 1, i*24 + 32), ' ') AS chunk_text,
       CAST(least(len(ws) - i*24, 32) AS BIGINT) AS n_tokens
FROM x
""",
    tags=("text-chunking",),
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window 32, stride 24) — the
    training-sample assembly step. Expression-only map stage; output
    rows ∝ corpus tokens / stride."""
    from pg_lakehouse_spark.llm.text import chunk_documents

    docs = t(spark, sf_dir, "documents")
    return chunk_documents(docs, window=32, stride=24)


@register(
    "text_repetition_signals",
    oracle="""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws
  FROM documents
), stats AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         len(list_distinct(ws)) AS nd
  FROM base
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i+1])) AS bg
  FROM base
), counts AS (
  SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2
), top AS (
  SELECT doc_id, max(c) AS top_bigram_n, sum(c) AS n_bigrams
  FROM counts GROUP BY 1
)
SELECT s.doc_id, s.n_words,
       floor((1.0 - s.nd * 1.0 / greatest(s.n_words, 1)) * 10000) / 10000
         AS dup_word_ratio,
       CAST(coalesce(t.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       CAST(coalesce(t.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       floor(CASE WHEN coalesce(t.n_bigrams, 0) > 0
                  THEN t.top_bigram_n * 1.0 / t.n_bigrams
                  ELSE 0.0 END * 10000) / 10000 AS top_bigram_ratio
FROM stats s LEFT JOIN top t USING (doc_id)
""",
    tags=("text-repetition",),
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: duplicate-word fraction and
    top-bigram share, computed distributed (explode + hash-agg), never
    O(len²) in-row."""
    from pg_lakehouse_spark.llm.text import repetition_signals

    docs = t(spark, sf_dir, "documents")
    return repetition_signals(docs)


@register(
    "text_pii_redaction",
    oracle="""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(
               substr(text, 1, 80)
                 || ' reach me: user' || doc_id || '@example.com or +1 555 '
                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 || ' 1234 host 10.0.' || (doc_id % 256) || '.7 ssn 123-45-6789',
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\\b\\d{3}-\\d{2}-\\d{4}\\b', '[SSN]', 'g'),
           '\\+\\d{1,2}[- ]\\d{3}[- ]\\d{3,4}[- ]\\d{4}', '[PHONE]', 'g'),
         '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g')
       AS redacted
FROM documents
""",
    tags=("text-pii",),
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub before a training run: emails/SSNs/phones/IPv4s
    masked with typed tokens. The corpus is synthetic, so the PII is
    injected deterministically per doc, then redacted — the oracle
    replays both steps."""
    from pg_lakehouse_spark.llm.text import redact_pii

    docs = t(spark, sf_dir, "documents")
    dirty = F.concat(
        F.substring(F.col("text"), 1, 80),
        F.lit(" reach me: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 555 "),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" 1234 host 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 ssn 123-45-6789"),
    )
    return docs.select("doc_id", redact_pii(dirty).alias("redacted"))


@register(
    "text_vocabulary",
    oracle="""
WITH terms AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
  FROM documents
), vocab AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS term_freq,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
  FROM terms GROUP BY term
)
SELECT term, term_freq, doc_freq
FROM vocab
WHERE doc_freq >= 2
ORDER BY term_freq DESC, term ASC
LIMIT 200
""",
    tags=("text-vocabulary",),
)
def text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary (term/document frequencies, min_df pruning,
    deterministic top-k) — tokenizer-training's first pass."""
    from pg_lakehouse_spark.llm.text import vocabulary

    docs = t(spark, sf_dir, "documents")
    return vocabulary(docs, min_df=2, top_k=200)


@register(
    "text_quality_filter",
    oracle="""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws
  FROM documents
), sig AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         1.0 - len(list_distinct(ws)) * 1.0 / greatest(len(ws), 1) AS dup,
         len(list_filter(ws, w -> list_contains(
           ['the','and','of','to','a','in','is','it','that','this','with','for','as','on'],
           w))) * 1.0 / greatest(len(ws), 1) AS stop_ratio
  FROM base
)
SELECT doc_id, n_words,
       floor(dup * 10000) / 10000 AS dup_word_ratio,
       floor(stop_ratio * 10000) / 10000 AS stopword_ratio,
       CASE WHEN n_words < 30 THEN 'too_short'
            WHEN n_words > 1000 THEN 'too_long'
            WHEN dup > 0.82 THEN 'repetitive'
            WHEN stop_ratio < 0.01 THEN 'low_stopword'
            ELSE NULL END AS reject_reason,
       CASE WHEN n_words < 30 THEN 'too_short'
            WHEN n_words > 1000 THEN 'too_long'
            WHEN dup > 0.82 THEN 'repetitive'
            WHEN stop_ratio < 0.01 THEN 'low_stopword'
            ELSE NULL END IS NULL AS keep
FROM sig
""",
    tags=("text-quality-filter",),
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite pretraining keep/drop gate with first-failing-rule
    reject reasons; thresholds tuned so the synthetic corpus actually
    splits (some docs pass, some fail)."""
    from pg_lakehouse_spark.llm.text import quality_filter

    docs = t(spark, sf_dir, "documents")
    return quality_filter(
        docs,
        min_words=30,
        max_words=1000,
        max_dup_word_ratio=0.82,
        min_stopword_ratio=0.01,
    ).select(
        "doc_id", "n_words", "dup_word_ratio", "stopword_ratio",
        "reject_reason", "keep",
    )


@register(
    "pack_sequences_stream",
    oracle="""
WITH toks AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents
), cums AS (
  SELECT doc_id, shard, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM toks
)
SELECT doc_id, shard, n_tokens,
       CAST(floor(cb / 64.0) AS BIGINT) AS seq_in_shard,
       CAST(cb % 64 AS BIGINT) AS begin_offset
FROM cums
""",
    tags=("pack-sequences",),
)
def pack_sequences_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut sequence packing: documents laid end-to-end per
    shard, cut into 64-token training sequences; each doc gets the
    sequence it starts in plus its offset. One shuffle, window-only —
    the pretraining "pack then chunk" recipe at any corpus size."""
    from pg_lakehouse_spark.llm.packing import pack_sequences

    docs = t(spark, sf_dir, "documents")
    return pack_sequences(
        docs, budget=64, shards=8, shard_by="modulo"
    ).select("doc_id", "shard", "n_tokens", "seq_in_shard", "begin_offset")


@register(
    "pack_bins_greedy",
    oracle=None,  # greedy best-fit is not SQL-expressible; contract is
    # property-tested in tests/test_llm.py (budget respected, exactly-
    # one bin per doc, partitioning-independent determinism)
    tags=("pack-bins",),
)
def pack_bins_greedy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document bin packing (best-fit decreasing per shard) for
    SFT-style training where examples must not straddle sequences."""
    from pg_lakehouse_spark.llm.packing import pack_bins_greedy

    docs = t(spark, sf_dir, "documents")
    return pack_bins_greedy(docs, budget=128, shards=8).select(
        "doc_id", "shard", "n_tokens", "bin_in_shard"
    )


@register(
    "interleave_language_mix",
    oracle="""
WITH weighted AS (
  SELECT doc_id, lang,
         CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5
                   WHEN 'fr' THEN 0.5 WHEN 'es' THEN 0.25
                   WHEN 'zh' THEN 0.25 END AS w,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id)
              AS BIGINT) AS source_rank
  FROM documents
)
SELECT doc_id, lang, source_rank, source_rank / w AS mix_pos
FROM weighted
""",
    tags=("interleave",),
)
def interleave_language_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted corpus interleave ("sampling
    temperature" mix): position = rank-within-language / weight, so
    ORDER BY mix_pos yields the training stream with languages in the
    requested proportions. Weights are powers of two, so the float
    math is engine-exact — no rounding shim needed."""
    from pg_lakehouse_spark.llm.packing import interleave_sources

    docs = t(spark, sf_dir, "documents")
    return interleave_sources(
        docs,
        "lang",
        {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.25},
    ).select("doc_id", "lang", "source_rank", "mix_pos")


@register(
    "text_bm25_postings",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
  FROM documents
), toks2 AS (
  SELECT * FROM toks WHERE term <> ''
), post AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks2 GROUP BY 1, 2
), dl AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY 1
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY 1
)
SELECT p.doc_id, p.term, p.tf, dl.dl, dfreq.df
FROM post p
JOIN dl USING (doc_id)
JOIN dfreq USING (term)
WHERE p.term IN ('the', 'data', 'model')
""",
    tags=("text-search", "bm25"),
)
def text_bm25_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index statistics for retrieval (the integer core of
    BM25 — tf, document length, document frequency): one explode +
    two hash aggregates; a query's scoring touches only its own
    terms' postings. The float BM25 ranking is property-tested
    (tests/test_llm.py) since ln() is engine-specific at the ulp."""
    from pg_lakehouse_spark.llm.search import build_postings, term_stats

    docs = t(spark, sf_dir, "documents")
    post = build_postings(docs)
    stats = term_stats(post)
    return (
        post.filter(F.col("term").isin(["the", "data", "model"]))
        .join(stats, "term")
        .select("doc_id", "term", "tf", "dl", "df")
    )


@register(
    "multimodal_audio",
    oracle="""
WITH s AS (
  SELECT doc_id AS media_id, length(text) AS n,
         [ord(text[i]) for i in range(1, length(text) + 1)] AS bs
  FROM documents
), m AS (
  SELECT media_id, n, bs,
         list_sum(bs) * 1.0 / n AS mu,
         list_sum([(b - 128) * (b - 128) for b in bs]) AS ss
  FROM s
)
SELECT media_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(floor(n * 1000.0 / 16000) AS BIGINT) AS duration_ms,
       CAST(floor(sqrt(ss * 1.0 / n) * 10000) AS BIGINT) AS rms_e4,
       CAST(len([i for i in range(1, n)
                 if (bs[i] > mu) != (bs[i + 1] > mu)]) AS BIGINT)
         AS crossings
FROM m
""",
    tags=("multimodal", "audio"),
)
def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-column pipeline: 8-bit-PCM payloads decoded to waveform
    stats (duration, RMS, mean-crossings) in numpy over Arrow batches.
    IEEE sqrt is correctly rounded, so even the RMS hash-matches the
    DuckDB oracle exactly (ASCII corpus ⇒ bytes == codepoints)."""
    from pg_lakehouse_spark.llm.multimodal import (
        decode_audio,
        synthesize_audio,
    )

    docs = t(spark, sf_dir, "documents")
    return decode_audio(synthesize_audio(docs, "doc_id", "text"))


@register(
    "text_bpe_tokenize",
    oracle=None,  # BPE training is an iterative algorithm (per-round
    # argmax) — not SQL-expressible; correctness is pinned by
    # tests/test_llm.py (canonical-corpus merges, lossless round-trip,
    # determinism, compression)
    tags=("text-bpe",),
)
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training end-to-end: learn 24 BPE merges from the
    corpus word-frequency table (vocabulary-sized loop, one corpus
    scan total), then tokenize every document map-only with the
    learned ranks."""
    from pg_lakehouse_spark.llm.bpe import apply_bpe, train_bpe

    docs = t(spark, sf_dir, "documents")
    merges = train_bpe(docs, 24)
    return apply_bpe(docs, merges).select(
        "doc_id",
        F.size("bpe_tokens").alias("n_bpe_tokens"),
        F.length("text").alias("n_chars"),
    )


@register(
    "dedup_lines_corpus",
    oracle="""
WITH words AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')
           AS ws
  FROM documents
), toks AS (
  SELECT doc_id, unnest(ws) AS w,
         unnest(range(1, len(ws) + 1)) AS i
  FROM words
), lines AS (
  SELECT doc_id, CAST(floor((i - 1) / 4) AS INT) AS grp,
         string_agg(w, ' ' ORDER BY i) AS line
  FROM toks GROUP BY doc_id, 2
), counted AS (
  SELECT doc_id, grp, line,
         count(*) OVER (PARTITION BY trim(line)) AS c
  FROM lines
), kept AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY grp) AS text
  FROM counted WHERE c < 2 GROUP BY doc_id
)
SELECT doc_id, text FROM kept WHERE length(trim(text)) > 0
""",
    tags=("dedup-lines",),
)
def dedup_lines_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line dedup (RefinedWeb boilerplate removal). The
    synthetic corpus has no newlines, so both sides first derive
    pseudo-lines (4-word windows) identically; ``dedup_lines`` then
    removes every line occurring twice-plus across the corpus and
    reassembles documents in order, dropping fully-boilerplate docs."""
    from pg_lakehouse_spark.llm.dedup import dedup_lines

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(
        F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), " "
    )
    n_lines = F.ceil(F.size(words) / F.lit(4)).cast("int")
    lines_arr = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(F.slice(words, i * 4 + 1, 4), " "),
    )
    pseudo = docs.filter(F.size(words) > 0).select(
        "doc_id", F.array_join(lines_arr, "\n").alias("text")
    )
    return dedup_lines(pseudo, min_dup=2)


@register(
    "balance_source_cap",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source, lang,
         row_number() OVER (
           PARTITION BY source
           ORDER BY (doc_id * 1103515245 + 12345) % 2147483648, doc_id
         ) AS rn
  FROM documents
)
SELECT doc_id, source, lang FROM ranked WHERE rn <= 10
""",
    tags=("domain-balance",),
)
def balance_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (C4/RefinedWeb domain balancing): at
    most 10 docs per source survive, chosen by a deterministic
    multiplicative hash of doc_id (an unbiased per-source sample,
    stable across runs/partitionings, oracle-expressible)."""
    from pg_lakehouse_spark.llm.splits import balance_by_key

    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return balance_by_key(docs, "source", cap=10)


@register(
    "interleave_temperature",
    oracle="""
WITH cnt AS (
  SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM documents GROUP BY 1
), w AS (
  SELECT lang, pow(c, 1.0/2.0 - 1.0) AS w FROM cnt
), ranked AS (
  SELECT doc_id, lang,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id)
              AS BIGINT) AS source_rank
  FROM documents
)
SELECT r.doc_id, r.lang, r.source_rank,
       round(r.source_rank / w.w, 4) AS mix_pos
FROM ranked r JOIN w USING (lang)
""",
    tags=("interleave", "temperature"),
)
def interleave_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled corpus mix (T=2): weights derive from the
    source counts themselves (q_s ∝ p_s^(1/T); per-source rate =
    count^(1/T−1)), upsampling low-resource languages toward uniform —
    the standard multilingual-training mix. Oracle recomputes the same
    weights in SQL; both sides round mix_pos to 4 decimals (pow is
    libm-identical here, rounding guards the division ulp)."""
    from pg_lakehouse_spark.llm.packing import temperature_mix

    docs = t(spark, sf_dir, "documents")
    return temperature_mix(docs, "lang", temperature=2.0).select(
        "doc_id",
        "lang",
        "source_rank",
        F.round(F.col("mix_pos"), 4).alias("mix_pos"),
    )


@register(
    "dedup_duplicate_spans",
    oracle="""
WITH spans AS (
  SELECT doc_id, substr(text, CAST(pos AS INT), 64) AS span
  FROM (
    SELECT doc_id, text,
           unnest(range(1, length(text) - 62, 32)) AS pos
    FROM documents WHERE length(text) >= 64
  ) w
)
SELECT min(doc_id) AS sample_doc,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       count(*) AS n_occurrences
FROM spans
GROUP BY span
HAVING count(DISTINCT doc_id) >= 2
""",
    tags=("llm", "dedup", "span-dedup"),
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-PASSAGE detection (r7): fixed-width character
    windows at stride window/2, hashed and hash-aggregated — finds
    boilerplate shared across otherwise-distinct documents, which
    document-level and MinHash dedup both miss. The engine groups by
    an 8-byte xxhash64 of the window (the text never crosses the
    shuffle); the oracle groups by the window TEXT itself — identical
    result sets absent a 64-bit collision."""
    from pg_lakehouse_spark.llm.dedup import duplicate_spans

    docs = t(spark, sf_dir, "documents")
    return duplicate_spans(
        docs, id_col="doc_id", text_col="text", window=64, stride=32
    ).select("sample_doc", "n_docs", "n_occurrences")


@register(
    "dedup_span_share",
    oracle="""
WITH spans AS (
  SELECT doc_id, substr(text, CAST(pos AS INT), 64) AS span
  FROM (
    SELECT doc_id, text,
           unnest(range(1, length(text) - 62, 32)) AS pos
    FROM documents WHERE length(text) >= 64
  ) w
), dup AS (
  SELECT span FROM spans GROUP BY span
  HAVING count(DISTINCT doc_id) >= 2
)
SELECT s.doc_id,
       count(*) AS total_spans,
       count(*) FILTER (WHERE d.span IS NOT NULL) AS dup_spans,
       round(count(*) FILTER (WHERE d.span IS NOT NULL)
             / CAST(count(*) AS DOUBLE), 6) AS dup_share
FROM spans s LEFT JOIN dup d USING (span)
GROUP BY s.doc_id
HAVING count(*) FILTER (WHERE d.span IS NOT NULL) > 0
""",
    tags=("llm", "dedup", "span-dedup", "quality"),
)
def dedup_span_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate share (r7): fraction of a document's
    64-char windows repeated in other documents — the actionable
    filtering score built on the span index (one span explosion, two
    8-byte hash shuffles; text never crosses the wire)."""
    from pg_lakehouse_spark.llm.dedup import span_duplication_share

    docs = t(spark, sf_dir, "documents")
    return span_duplication_share(
        docs, id_col="doc_id", text_col="text", window=64, stride=32
    ).filter(F.col("dup_spans") > 0)
