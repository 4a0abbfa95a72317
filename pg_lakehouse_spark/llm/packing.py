"""Training-batch assembly: sequence packing and corpus interleaving.

The last mile of a pretraining data pipeline: documents → fixed
token-budget training sequences (packing) and multiple corpora → one
deterministically-mixed stream (interleaving). Both are pure DataFrame
expression pipelines except the greedy bin packer, which is an
``applyInPandas`` per shard.

100 TB posture: every operator here partitions by a content-derived
shard key first, so all window/packing state is per-shard — no global
window, no driver state. Shard count is the scale knob: pick it so one
shard's documents fit one executor's memory (the greedy packer) or
just its task (the streaming packer, which is pure window math).

Reference: the reference engine has no training-data surface (it is a
PG storage extension); these extend the north-star Tier C inventory
(BASELINE.json / SURVEY.md §2 Tier C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pg_lakehouse_spark.llm.text import token_count_ws


def _shard_expr(id_col: str, shards: int, shard_by: str):
    """modulo → engine-portable (oracle-checkable twin); hash →
    uniform for any id distribution (production default)."""
    if shard_by == "modulo":
        return F.pmod(F.col(id_col).cast("long"), F.lit(shards))
    if shard_by == "hash":
        return F.pmod(F.xxhash64(F.lit(17), F.col(id_col)), F.lit(shards))
    raise ValueError(f"shard_by must be 'modulo' or 'hash', got {shard_by!r}")


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    shards: int = 8,
    shard_by: str = "hash",
    token_col: str | None = None,
) -> DataFrame:
    """Concat-and-cut packing: within each shard, documents are laid
    end-to-end in ``id_col`` order and the token stream is cut into
    ``budget``-sized training sequences. Each document is assigned the
    sequence where it *starts* (``seq_in_shard``) and its offset into
    that sequence (``begin_offset``); a document may spill into the
    next sequence — exactly the GPT-style "pack then chunk" recipe,
    where sequence boundaries ignore document boundaries.

    Pure window math: one shuffle (by shard), one ordered window per
    shard, no state beyond the running token sum — at any corpus size
    the cost is a single repartition plus a per-shard sort.

    Adds: ``shard``, ``n_tokens``, ``seq_in_shard``, ``begin_offset``.
    """
    tokens = (
        F.col(token_col) if token_col else token_count_ws(F.col(text_col))
    ).cast("long")
    out = df.withColumn("shard", _shard_expr(id_col, shards, shard_by))
    out = out.withColumn("n_tokens", tokens)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return out.withColumn(
        "seq_in_shard", F.floor(cum_before / budget).cast("long")
    ).withColumn("begin_offset", F.pmod(cum_before, F.lit(budget)))


def pack_bins_greedy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    shards: int = 8,
    shard_by: str = "hash",
    token_col: str | None = None,
) -> DataFrame:
    """Whole-document packing (no document ever straddles a sequence):
    best-fit-decreasing bin packing per shard. For SFT-style training
    where examples must not be cut.

    Contract: every row is assigned exactly one ``bin_in_shard``; no
    bin's token total exceeds ``budget`` unless a single document
    alone exceeds it (that document gets a bin of its own). The
    assignment is deterministic — independent of input partitioning —
    because each shard's rows are sorted by (tokens desc, id) before
    packing.

    Scale: packing state is one shard in pandas; shards is the knob
    that bounds per-task memory. The packer is O(n log n) per shard
    (bisect over bin remainders).
    """
    import bisect

    import pandas as pd

    tokens = (
        F.col(token_col) if token_col else token_count_ws(F.col(text_col))
    ).cast("long")
    prepared = df.withColumn(
        "shard", _shard_expr(id_col, shards, shard_by)
    ).withColumn("n_tokens", tokens)

    schema = prepared.select(
        id_col, "shard", "n_tokens"
    ).withColumn("bin_in_shard", F.lit(0).cast("long")).schema

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        # parallel arrays sorted by remaining capacity (bisect keys)
        remaining: list[int] = []
        bin_ids: list[int] = []
        next_bin = 0
        assigned = []
        for tok in pdf["n_tokens"].to_list():
            # best fit: smallest remaining >= tok
            i = bisect.bisect_left(remaining, tok)
            if i < len(remaining):
                b = bin_ids.pop(i)
                rem = remaining.pop(i) - tok
            else:
                b = next_bin
                next_bin += 1
                rem = max(budget - tok, 0)
            j = bisect.bisect_left(remaining, rem)
            remaining.insert(j, rem)
            bin_ids.insert(j, b)
            assigned.append(b)
        pdf["bin_in_shard"] = pd.Series(assigned, dtype="int64")
        return pdf[[id_col, "shard", "n_tokens", "bin_in_shard"]]

    packed = prepared.select(id_col, "shard", "n_tokens").groupBy(
        "shard"
    ).applyInPandas(pack, schema)
    return prepared.join(packed.drop("shard", "n_tokens"), on=id_col)


def interleave_sources(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    id_col: str = "doc_id",
    pos_col: str = "mix_pos",
) -> DataFrame:
    """Deterministic weighted interleave of sub-corpora into one
    training-stream order (the "sampling temperature" mix): a row's
    position is ``rank_within_source / weight``, so a source with
    weight 2 appears twice as often per unit of stream as weight 1 —
    the classic deterministic version of weighted sampling without
    replacement. Downstream writes ``ORDER BY mix_pos`` (a range
    shuffle at scale, no global state).

    Sources absent from ``weights`` are dropped (weight 0). Adds
    ``source_rank`` (1-based rank within source) and ``pos_col``.
    """
    w_expr = None
    for name, wt in weights.items():
        cond = F.col(source_col) == name
        w_expr = (
            F.when(cond, float(wt))
            if w_expr is None
            else w_expr.when(cond, float(wt))
        )
    w_expr = w_expr.otherwise(F.lit(None))
    rank_w = Window.partitionBy(source_col).orderBy(id_col)
    out = (
        df.withColumn("__w", w_expr)
        .filter(F.col("__w").isNotNull() & (F.col("__w") > 0))
        .withColumn("source_rank", F.row_number().over(rank_w))
        .withColumn(pos_col, F.col("source_rank") / F.col("__w"))
        .drop("__w")
    )
    return out


def temperature_weights(
    df: DataFrame, source_col: str, temperature: float
) -> dict[str, float]:
    """Sampling-temperature weights from the corpus itself: with
    source share ``p_s``, temperature sampling draws with probability
    ``q_s ∝ p_s^(1/T)`` (the multilingual-training standard — T=1
    keeps natural proportions, T→∞ approaches uniform across
    sources). ``interleave_sources`` consumes a per-source RATE, so
    the weight is ``q_s / p_s ∝ count_s^(1/T − 1)``. One count
    aggregate; only #sources rows reach the driver."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    rows = df.groupBy(source_col).count().collect()
    ex = 1.0 / float(temperature) - 1.0
    return {r[source_col]: float(r["count"]) ** ex for r in rows}


def temperature_mix(
    df: DataFrame,
    source_col: str,
    temperature: float,
    id_col: str = "doc_id",
    pos_col: str = "mix_pos",
) -> DataFrame:
    """Temperature-sampled corpus interleave: compute the weights from
    the source counts (``temperature_weights``) and order the stream
    by ``pos_col`` — low-resource sources are upsampled toward
    uniform as T grows, exactly the mixing used for multilingual /
    multi-domain training corpora."""
    return interleave_sources(
        df,
        source_col,
        temperature_weights(df, source_col, temperature),
        id_col=id_col,
        pos_col=pos_col,
    )


def export_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    id_col: str = "doc_id",
    order_col: str | None = None,
    fmt: str = "parquet",
    seed: int = 17,
) -> dict:
    """Training-data handoff: write the corpus as ``num_shards``
    hash-assigned shards (``shard=N`` hive dirs) plus a ``manifest
    .json`` recording per-shard row counts and bytes.

    Contract a data-loader relies on: shard membership is a pure
    function of row CONTENT (xxhash64 of ``id_col``) — stable across
    re-exports, cluster sizes, and input partitioning; within a shard,
    rows are ordered by ``order_col`` when given (e.g. the interleave
    ``mix_pos``), so shard files replay the curriculum order. One
    repartition (the shard shuffle) + optional within-partition sort;
    the manifest aggregate is one count per shard — metadata-sized.
    """
    import json
    import os

    from pg_lakehouse_spark import sources

    shard = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(num_shards))
    out = df.withColumn("shard", shard).repartition(num_shards, "shard")
    if order_col is not None:
        out = out.sortWithinPartitions("shard", order_col)
    sources.write(out, path, fmt=fmt, mode="error", partition_by=["shard"])
    counts = {
        int(r.shard): int(r.n)
        for r in out.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    shard_bytes: dict[int, int] = {}
    for root, _dirs, files in os.walk(path):
        base = os.path.basename(root)
        if base.startswith("shard="):
            sid = int(base.split("=", 1)[1])
            shard_bytes[sid] = shard_bytes.get(sid, 0) + sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith(("_", "."))
            )
    manifest = {
        "format": fmt,
        "num_shards": num_shards,
        "id_col": id_col,
        "order_col": order_col,
        "seed": seed,
        "total_rows": sum(counts.values()),
        "shards": [
            {
                "shard": s,
                "rows": counts.get(s, 0),
                "bytes": shard_bytes.get(s, 0),
            }
            for s in range(num_shards)
        ],
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
