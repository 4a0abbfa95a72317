"""Distributed BPE tokenizer training and application.

Industrial BPE training shape: the corpus collapses ONCE into a
word-frequency table (the only corpus-sized job); the merge loop then
runs on that vocabulary-sized frame — count adjacent symbol pairs
(weighted by word frequency), pick the most frequent, fuse it, repeat.
Pair counting and merge application are pure Spark expressions
(explode + hash agg, aggregate() fold); only the single winning pair
row crosses to the driver per round, so training N merges is N small
jobs over the word table, never the corpus.

Application (`apply_bpe`) replays the learned merge list inside an
Arrow-batched pandas UDF with a rank dict — the classic fast path —
so tokenizing the full corpus is one map-only pass.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_lakehouse_spark.llm.text import words

END = "</w>"  # end-of-word marker, standard BPE


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the corpus — the one corpus-sized aggregate."""
    return (
        df.select(F.explode(words(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word_freq: DataFrame) -> DataFrame:
    """word → array of single-character symbols + end-of-word marker."""
    return word_freq.withColumn(
        "symbols",
        F.concat(
            F.split(F.col("word"), ""),  # chars
            F.array(F.lit(END)),
        ),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.arrays_zip(
        F.slice(F.col("symbols"), 1, F.size("symbols") - 1).alias("a"),
        F.slice(F.col("symbols"), 2, F.size("symbols") - 1).alias("b"),
    )
    return (
        vocab.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("n"))
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Fuse every adjacent (a, b) into ab — leftmost-first,
    non-overlapping, as a pure aggregate() fold (stays in the JVM)."""
    merged = F.lit(a + b)
    fused = F.aggregate(
        F.col("symbols"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return vocab.withColumn("symbols", fused)


def train_bpe(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list (the tokenizer model). Deterministic: ties on
    pair count break on (a, b) lexicographically.

    Each round is one explode+agg over the WORD TABLE (vocabulary-
    sized) and collects exactly one row; ``checkpoint_every`` rounds
    the fused vocab localCheckpoints to truncate the growing
    expression lineage (same device as connected_components)."""
    vocab = _initial_symbols(word_frequencies(df, text_col)).persist()
    vocab.count()  # materialize before the loop
    merges: list[tuple[str, str]] = []
    for i in range(num_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()  # ONE (a, b, n) row per round — metadata
        )
        if not top or top[0].n < 2:
            break
        a, b = top[0].a, top[0].b
        merges.append((a, b))
        vocab = _apply_merge(vocab, a, b)
        if (i + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a learned merge list: per word, repeatedly fuse
    the best-ranked adjacent pair (the canonical greedy BPE encoder),
    vectorized over Arrow batches. Map-only — no shuffle."""
    from pyspark.sql.types import ArrayType, StringType, StructType

    ranks = {pair: i for i, pair in enumerate(merges)}
    # list() copy: StructType aliases the list it is given, and .add
    # appends in place — without the copy the SOURCE df's cached
    # schema would grow the new column too
    schema = StructType(list(df.schema.fields)).add(
        out_col, ArrayType(StringType())
    )

    def encode_word(word: str) -> list[str]:
        syms = list(word) + [END]
        while len(syms) > 1:
            best, best_rank = None, None
            for j in range(len(syms) - 1):
                r = ranks.get((syms[j], syms[j + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = j, r
            if best is None:
                break
            syms[best: best + 2] = [syms[best] + syms[best + 1]]
        return syms

    def encode(batches):
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                out: list[str] = []
                for w in (text or "").lower().split():
                    out.extend(encode_word(w))
                toks.append(out)
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(toks, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(encode, schema=schema)
