"""LLM-data-pipeline operators (SURVEY.md §2 Tier C).

Large-scale training-data operations over document/embedding tables:

- ``text``        tokenization, shingling, quality scoring, language
                  ID, fingerprinting — all built-in-function pipelines.
- ``dedup``       exact, n-gram Jaccard (inverted index), MinHash+LSH,
                  SimHash — each with a scale-correct shuffle plan.
- ``similarity``  brute-force cosine top-k and hyperplane-LSH ANN.
- ``multimodal``  binary-column plumbing for image/audio payloads with
                  Arrow-batched decode UDFs (decoders stubbed — codec
                  libs aren't in this container; the Spark-side schema,
                  batching, and partitioning are real).
- ``packing``     training-batch assembly: sequence packing, greedy
                  bin packing, weighted interleave, sharded export.
- ``search``      BM25 keyword retrieval: postings build/maintenance
                  (change-feed incremental) and query-scoped scoring.
- ``bpe``         distributed BPE tokenizer training + application.
- ``index``       persisted IVF ANN index with incremental refresh.
- ``splits``      deterministic train/val/test splits and sampling.
- ``decontaminate`` benchmark n-gram overlap removal.
"""

from pg_lakehouse_spark.llm.dedup import (
    dedup_exact,
    jaccard_near_duplicates,
    minhash_lsh_candidates,
    simhash_near_duplicates,
)
from pg_lakehouse_spark.llm.packing import (
    interleave_sources,
    pack_bins_greedy,
    pack_sequences,
)
from pg_lakehouse_spark.llm.search import bm25_search, build_postings
from pg_lakehouse_spark.llm.similarity import ann_join, cosine_topk, lsh_ann_topk
from pg_lakehouse_spark.llm.text import (
    add_quality_signals,
    language_id,
    shingles,
    words,
)

__all__ = [
    "dedup_exact",
    "jaccard_near_duplicates",
    "minhash_lsh_candidates",
    "simhash_near_duplicates",
    "cosine_topk",
    "lsh_ann_topk",
    "ann_join",
    "pack_sequences",
    "pack_bins_greedy",
    "interleave_sources",
    "bm25_search",
    "build_postings",
    "add_quality_signals",
    "language_id",
    "shingles",
    "words",
]
