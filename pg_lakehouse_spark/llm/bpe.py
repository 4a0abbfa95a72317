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
    return _apply_merges(vocab, [(a, b)])


def _apply_merges(
    vocab: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Fuse every adjacent occurrence of ANY pair in ``pairs`` in one
    left-to-right fold pass. Callers must pass symbol-disjoint pairs
    (no symbol shared between two pairs, no fused output colliding
    with another pair's symbol) — then one combined pass is exactly
    the sequential application of each merge."""
    fused = F.aggregate(
        F.col("symbols"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: _fold_step(acc, x, pairs),
    )
    return vocab.withColumn("symbols", fused)


def _fold_step(acc, x, pairs: list[tuple[str, str]]):
    """One fold step: if (last(acc), x) is a selected pair, replace
    the tail with the fused symbol, else append x."""
    expr = F.concat(acc, F.array(x))
    tail = F.element_at(acc, -1)
    for a, b in pairs:
        expr = F.when(
            (F.size(acc) > 0) & (tail == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(expr)
    return expr


def train_bpe(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
    batch: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list (the tokenizer model). Deterministic: ties on
    pair count break on (a, b) lexicographically.

    Each round is one explode+agg over the WORD TABLE (vocabulary-
    sized) and collects one bounded row set; ``checkpoint_every``
    applied-merge count the fused vocab localCheckpoints to truncate
    the growing expression lineage (same device as
    connected_components).

    ``batch > 1`` selects up to that many SYMBOL-DISJOINT pairs from
    one count table per round and fuses them in a single pass —
    cutting the sequential round count ~batch× for large
    vocabularies. Disjointness makes the combined pass equal to
    applying the selected merges sequentially, but later batch
    members are chosen against the ROUND-START counts, so the merge
    LIST may diverge from strict one-at-a-time greedy when an early
    merge would have spawned a higher-count pair (e.g. chains like
    ``(x,y)`` then ``(xy,</w>)``). batch=1 is exact greedy; batched
    training is the standard scale trade for 10k+-merge vocabularies.
    """
    vocab = _initial_symbols(word_frequencies(df, text_col)).persist()
    vocab.count()  # materialize before the loop
    merges: list[tuple[str, str]] = []
    applied = 0
    while len(merges) < num_merges:
        want = min(batch, num_merges - len(merges))
        top = (
            _pair_counts(vocab)
            .filter(F.col("n") >= 2)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            # over-fetch: overlapping candidates get skipped
            .limit(max(want * 4, 8))
            .collect()  # bounded rows per round — metadata-scale
        )
        if not top:
            break
        picked: list[tuple[str, str]] = []
        used: set[str] = set()
        for r in top:
            if len(picked) >= want:
                break
            a, b, ab = r.a, r.b, r.a + r.b
            # disjoint from every already-picked pair: no shared
            # symbol, and no fused output colliding with a symbol
            # (or fused output) of another pick
            if {a, b, ab} & used:
                continue
            picked.append((a, b))
            used |= {a, b, ab}
        if not picked:
            break
        merges.extend(picked)
        vocab = _apply_merges(vocab, picked)
        prev = applied
        applied += len(picked)
        if applied // checkpoint_every > prev // checkpoint_every:
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
