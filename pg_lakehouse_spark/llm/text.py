"""Text-analysis primitives: tokenization, shingling, quality signals,
language ID, fingerprinting.

Everything is built-in ``pyspark.sql.functions`` — array/string
expressions inside whole-stage codegen, no Python in the hot path.
At 100 TB these are embarrassingly parallel map-only stages: no
shuffle, no skew sensitivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword heuristic.
# Deliberately small: language ID at pipeline scale is a cheap first
# pass; ambiguous docs go to a model scorer (see multimodal's UDF
# pattern for how that would batch).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "los", "que", "de", "y", "es", "un"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "des"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["that", "this", "with", "for", "as", "on"]

# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols —
# the shape GPT-style byte-pair encoders use as their pre-split.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text: Column, lowercase: bool = True) -> Column:
    """Whitespace tokenization → array<string>."""
    t = F.lower(text) if lowercase else text
    return F.split(t, r"\s+")


def shingles(text: Column, n: int = 3, lowercase: bool = True) -> Column:
    """Distinct word n-gram shingles → array<string>.

    Documents shorter than n words yield a single whole-text shingle
    (never an empty set — empty sets break Jaccard denominators).
    """
    ws = words(text, lowercase)
    k = F.size(ws)
    # n shifted copies zipped → one struct per gram position, then a
    # single concat per gram. The per-POSITION slice+concat of the
    # naive formulation runs interpreted inside transform() and
    # measured 5× slower at sf0.1 (3.1s vs 0.62s for the exploded
    # hashed-shingle scan); here the slices are n array ops total.
    shifted = [F.slice(ws, i + 1, k - F.lit(n - 1)) for i in range(n)]
    grams = F.transform(
        F.arrays_zip(*shifted),
        lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]),
    )
    return F.when(k >= n, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", ws))
    )


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish pre-token count via regexp extraction."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def floor4(x: Column) -> Column:
    """Truncate to 4 decimals via floor-scaling. Unlike decimal
    rounding (whose half-way tie-breaking differs across engines),
    floor on an identical IEEE double is engine-identical — used for
    every derived ratio that a DuckDB oracle re-computes."""
    return F.floor(x * 10000) / 10000


def add_quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append heuristic quality-signal columns used by pretraining-data
    filters (C4/Gopher-style): length, word stats, punctuation/digit
    ratios, stopword ratio, and a composite score."""
    text = F.col(text_col)
    ws = words(text)
    n_chars = F.length(text)
    n_words = F.size(ws)
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    stop_hits = F.size(F.filter(ws, lambda w: w.isin(STOPWORDS_EN)))
    avg_word_len = F.when(n_words > 0, (n_chars - (n_words - 1)) / n_words).otherwise(
        F.lit(0.0)
    )
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    punct_ratio = floor4(punct / F.greatest(n_chars, F.lit(1)))
    stop_ratio4 = floor4(stop_ratio)
    # one withColumns call: each chained withColumn re-analyzes the
    # whole plan and pays its own driver round-trips (r14, guide §5);
    # no signal references another ADDED column, so one projection is
    # semantically identical to the chain
    return df.withColumns(
        {
            "n_chars_calc": n_chars.cast("long"),
            "n_words": n_words.cast("long"),
            "avg_word_len": floor4(avg_word_len),
            "punct_ratio": punct_ratio,
            "digit_ratio": floor4(digits / F.greatest(n_chars, F.lit(1))),
            "stopword_ratio": stop_ratio4,
            "quality_score": floor4(
                F.least(F.lit(1.0), n_words / F.lit(50.0)) * 0.4
                + (1 - F.least(F.lit(1.0), punct_ratio * 10)) * 0.3
                + F.least(F.lit(1.0), stop_ratio4 * 5) * 0.3
            ),
        }
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-stopword language ID: count marker hits per language,
    argmax with deterministic tie-break (language code ascending),
    'und' (undetermined) when nothing matches."""
    ws = words(F.col(text_col))

    def marker_hits(markers: list[str]) -> Column:
        # nb: the filter lambda must take exactly one parameter —
        # a second one makes Spark pass the element *index* there.
        return F.size(F.filter(ws, lambda w: w.isin(markers)))

    hit_cols = {lang: marker_hits(m) for lang, m in LANG_MARKERS.items()}
    # array of (hits, lang) structs → array_max picks max hits, then
    # ties resolve to the *smallest* lang code via negated comparison:
    # sort by (hits desc, lang asc) ≡ max of (hits, reversed-lang) —
    # simplest deterministic form: fold with explicit comparison.
    best = None
    for lang in sorted(LANG_MARKERS):  # ascending code order
        cand_hits, cand_lang = hit_cols[lang], F.lit(lang)
        if best is None:
            best = F.struct(cand_hits.alias("h"), cand_lang.alias("l"))
        else:
            better = cand_hits > best.getField("h")  # strict: first wins ties
            best = F.when(
                better, F.struct(cand_hits.alias("h"), cand_lang.alias("l"))
            ).otherwise(best)
    assert best is not None
    return df.withColumns(
        {
            "lang_pred": F.when(
                best.getField("h") > 0, best.getField("l")
            ).otherwise(F.lit("und")),
            "lang_pred_hits": best.getField("h").cast("long"),
        }
    )


def minhash_fingerprint(text: Column, n: int = 3) -> Column:
    """64-bit document fingerprint: min of xxhash64 over its shingle
    set — stable under shingle reordering, cheap dedup prefilter."""
    return F.array_min(
        F.transform(shingles(text, n), lambda s: F.xxhash64(s))
    )


def simhash64(text: Column, n: int = 2) -> Column:
    """64-bit SimHash over word n-gram shingles.

    bit b of the signature = majority vote of bit b across the
    xxhash64 of each shingle. Pure array expressions — per-row cost
    O(shingles × 64), no shuffle.
    """
    hs = F.transform(shingles(text, n), lambda s: F.xxhash64(s))
    sig = F.lit(0).cast("long")
    for b in range(64):
        ones = F.size(
            F.filter(hs, lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1)
        )
        vote = (ones * 2) > F.size(hs)
        sig = sig.bitwiseOR(
            F.when(vote, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    training-sample assembly step of a pretraining pipeline.

    Emits (id, chunk_id, chunk_text, n_tokens); the last chunk may be
    short, and a document shorter than ``window`` yields exactly one
    chunk. Expression-only (whole-stage codegen): tokenize → sequence
    of starts → slice + join, one explode. Map-only at any scale — no
    shuffle, output rows ∝ tokens/stride.
    """
    ws = words(F.col(text_col))
    n = F.size(ws)
    n_chunks = F.greatest(
        F.lit(1),
        (F.ceil((n - F.lit(window)) / F.lit(float(stride))) + 1).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.array_join(
                F.slice(ws, i * stride + 1, window), " "
            ).alias("chunk_text"),
            F.least(n - i * stride, F.lit(window))
            .cast("long")
            .alias("n_tokens"),
        ),
    )
    return df.select(id_col, F.explode(chunks).alias("c")).select(
        id_col, "c.chunk_id", "c.chunk_text", "c.n_tokens"
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality measures per document:
    duplicate-word fraction and the share of the single most frequent
    word bigram.

    The bigram mode runs explode → two hash-aggs keyed by document —
    deliberately NOT an in-row O(len²) array scan, so a pathological
    100k-token document costs O(len log len) distributed instead of
    10^10 comparisons in one task."""
    ws = words(F.col(text_col))
    base = df.select(id_col, ws.alias("__ws"))
    n = F.size(F.col("__ws"))
    word_stats = base.select(
        id_col,
        n.cast("long").alias("n_words"),
        F.size(F.array_distinct("__ws")).alias("__nd"),
    ).withColumn(
        "dup_word_ratio",
        floor4(
            F.lit(1.0)
            - F.col("__nd") / F.greatest(F.col("n_words"), F.lit(1))
        ),
    )
    grams = F.zip_with(
        F.slice(F.col("__ws"), 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("__ws"), 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    counts = (
        base.select(id_col, F.explode(grams).alias("bg"))
        .groupBy(id_col, "bg")
        .count()
    )
    top = counts.groupBy(id_col).agg(
        F.max("count").alias("top_bigram_n"),
        F.sum("count").alias("n_bigrams"),
    )
    return (
        word_stats.join(top, id_col, "left")
        .select(
            id_col,
            "n_words",
            "dup_word_ratio",
            F.coalesce("top_bigram_n", F.lit(0)).cast("long").alias("top_bigram_n"),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        )
        .withColumn(
            "top_bigram_ratio",
            floor4(
                F.when(
                    F.col("n_bigrams") > 0,
                    F.col("top_bigram_n") / F.col("n_bigrams"),
                ).otherwise(F.lit(0.0))
            ),
        )
    )


# PII redaction patterns — simple greedy shapes chosen to evaluate
# identically under Java regex (Spark) and RE2 (DuckDB oracle).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\+\d{1,2}[- ]\d{3}[- ]\d{3,4}[- ]\d{4}", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def redact_pii(text: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Mask emails / SSNs / phone numbers / IPv4s with typed tokens —
    the pre-release scrub of a training-data pipeline. Pure
    regexp_replace chain: codegen'd, map-only, no Python."""
    out = text
    for name, pat, repl in PII_PATTERNS:
        if kinds is None or name in kinds:
            out = F.regexp_replace(out, pat, repl)
    return out


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    top_k: int = 1000,
) -> DataFrame:
    """Corpus vocabulary with term and document frequencies — the
    first pass of tokenizer training / feature selection.

    explode → one hash-agg keyed by term (term_freq via count,
    doc_freq via count-distinct over doc ids); `min_df` prunes the
    hapax tail BEFORE the top-k sort, and top-k itself is
    TakeOrdered (no global sort materialization). Deterministic
    order: (term_freq desc, term asc)."""
    ws = words(F.col(text_col))
    terms = df.select(F.col(id_col).alias("__id"), F.explode(ws).alias("term"))
    vocab = (
        terms.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("term_freq"),
            F.countDistinct("__id").alias("doc_freq"),
        )
        .filter(F.col("doc_freq") >= min_df)
    )
    return vocab.orderBy(
        F.col("term_freq").desc(), F.col("term").asc()
    ).limit(top_k)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 100_000,
    max_dup_word_ratio: float = 0.95,
    min_stopword_ratio: float = 0.0,
) -> DataFrame:
    """Composite keep/drop gate over the cheap quality signals, with a
    deterministic first-failing-rule reject reason — the shape of a
    production pretraining filter stage. Expression-only (array ops
    inline), map-only at any scale."""
    text = F.col(text_col)
    ws = words(text)
    n = F.size(ws)
    nd = F.size(F.array_distinct(ws))
    dup = F.lit(1.0) - nd / F.greatest(n, F.lit(1))
    stop_hits = F.size(F.filter(ws, lambda w: w.isin(STOPWORDS_EN)))
    stop_ratio = F.when(n > 0, stop_hits / n).otherwise(F.lit(0.0))
    reason = (
        F.when(n < min_words, F.lit("too_short"))
        .when(n > max_words, F.lit("too_long"))
        .when(dup > max_dup_word_ratio, F.lit("repetitive"))
        .when(stop_ratio < min_stopword_ratio, F.lit("low_stopword"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        df.withColumn("n_words", n.cast("long"))
        .withColumn("dup_word_ratio", floor4(dup))
        .withColumn("stopword_ratio", floor4(stop_ratio))
        .withColumn("reject_reason", reason)
        .withColumn("keep", reason.isNull())
    )
