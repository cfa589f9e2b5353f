"""Stratified sampling: the data-mixing primitive of training pipelines
(per-language / per-source downsampling to hit a target mixture).

``sampleBy`` is a map-only Bernoulli filter — no shuffle, no collect; each
row flips a seeded coin keyed by its stratum, so the plan is a pure
filter over the scan and parallelizes trivially at 10^12 docs. Achieved
fractions concentrate around the targets at rate O(1/sqrt(n_stratum));
callers that need EXACT counts per stratum should instead rank with
row_number over a hash order and cut (exact but costs one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stratified_sample", "exact_stratified_sample", "mixture_report",
           "chunk_documents",
           "pack_shards"]


def stratified_sample(df: DataFrame, group_col: str, fractions: dict[str, float],
                      seed: int = 29) -> DataFrame:
    """Bernoulli per-stratum sample (map-only; approximate counts)."""
    return df.sampleBy(group_col, fractions, seed)


def exact_stratified_sample(df: DataFrame, group_col: str, fractions: dict[str, float],
                            id_col: str, seed: int = 29) -> DataFrame:
    """Exact per-stratum fractions: deterministic hash-order rank within the
    stratum, keep the first ceil(frac * n). One shuffle on the stratum key;
    reproducible for any seed regardless of partitioning."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
    n_w = Window.partitionBy(group_col)
    frac = F.coalesce(
        F.create_map(*[F.lit(x) for kv in fractions.items() for x in kv])[F.col(group_col)],
        F.lit(0.0),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(n_w))
        .where(F.col("_rn") <= F.ceil(frac * F.col("_n")))
        .drop("_rn", "_n")
    )


def mixture_report(full: DataFrame, sampled: DataFrame, group_col: str,
                   fractions: dict[str, float]) -> DataFrame:
    """Per-stratum achieved vs target fraction (for bound checking)."""
    tgt = F.create_map(*[F.lit(x) for kv in fractions.items() for x in kv])
    a = full.groupBy(group_col).agg(F.count(F.lit(1)).alias("total"))
    b = sampled.groupBy(group_col).agg(F.count(F.lit(1)).alias("kept"))
    return (
        a.join(b, group_col, "left")
        .select(
            group_col,
            "total",
            F.coalesce("kept", F.lit(0)).alias("kept"),
            F.round(F.coalesce("kept", F.lit(0)) / F.col("total"), 6).alias("achieved"),
            F.coalesce(tgt[F.col(group_col)], F.lit(0.0)).alias("target"),
        )
        .orderBy(group_col)
    )


def pack_shards(df: DataFrame, tokens_col: str, shard_budget: int,
                id_col: str = "doc_id", seed: int = 43,
                buckets: int = 256) -> DataFrame:
    """Assign every document to a training shard of ~``shard_budget`` tokens.

    The order is a deterministic hash shuffle of ``id_col`` (training
    shards want domain mixing, not source order), and the shard id is
    ``floor(running_tokens_before_doc / shard_budget)`` over that order —
    greedy packing, so each shard holds consecutive documents and can
    overshoot the budget by at most one document's tokens.

    Scale shape — the textbook global-cumsum trap (one ``Window.orderBy``
    over everything = a single-partition Exchange) is avoided with the
    two-level prefix-sum: documents hash into ``buckets`` ordered cells,
    per-bucket token totals (``buckets`` rows) prefix-sum on the driver,
    and the within-bucket cumulative window runs partitioned by bucket.
    One shuffle, no single-partition stage, identical output to the naive
    global window (pinned in tests).
    """
    from pyspark.sql import Window

    key = F.xxhash64(F.col(id_col), F.lit(seed))
    b = df.withColumn("_bkt", F.pmod(key, F.lit(buckets)).cast("int"))
    totals = {
        r["_bkt"]: r["t"]
        for r in b.groupBy("_bkt").agg(F.sum(tokens_col).alias("t")).collect()
    }  # bounded: `buckets` rows
    offsets, acc = {}, 0
    for bkt in range(buckets):
        offsets[bkt] = acc
        acc += int(totals.get(bkt, 0) or 0)
    off = F.create_map(
        *[F.lit(x) for bkt in range(buckets) for x in (bkt, offsets[bkt])]
    )
    w = (Window.partitionBy("_bkt")
         .orderBy(key, F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, -1))
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)) + off[F.col("_bkt")]
    return (b.withColumn("shard_id",
                         F.floor(before / F.lit(float(shard_budget))).cast("int"))
            .drop("_bkt"))


def chunk_documents(df: DataFrame, size: int, overlap: int = 0,
                    text_col: str = "text",
                    keep_cols: list | None = None) -> DataFrame:
    """Split documents into fixed-token training chunks with overlap —
    the standard LM-data assembly step between cleaning and shard
    packing (a 200k-token page must become ~size-token rows before
    packing or one document blows the shard budget).

    One output row per chunk: the kept columns plus ``(chunk_id,
    chunk_text, chunk_tokens)``. Chunk starts stride ``size - overlap``
    tokens; the final chunk is the remainder (>= 1 token — a shorter
    tail is real text, not discarded). Tokens are whitespace-split
    (callers tokenizing with BPE budget per chunk downstream via
    ``apply_bpe``).

    Plan: the text splits ONCE into a staged token-array column, chunk
    starts come from ``sequence``, and the explode is the only Generate
    — map-side, zero shuffles, no Python (plan-pinned). Documents with
    no tokens yield zero rows (they carry no trainable text)."""
    if size <= 0 or overlap < 0 or overlap >= size:
        raise ValueError("need size > 0 and 0 <= overlap < size")
    stride = size - overlap
    keep = keep_cols if keep_cols is not None else \
        [c for c in df.columns if c != text_col]
    toks = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
                    lambda x: x != "")
    staged = df.select(*keep, toks.alias("_toks"),
                       F.size(toks).alias("_n"))
    # chunk start indices: 1, 1+stride, ... while start <= n (1-based);
    # the last window may be short (the remainder tail)
    starts = F.when(F.col("_n") <= 0, F.array().cast("array<int>")) \
        .otherwise(F.sequence(F.lit(1), F.col("_n"), F.lit(stride))
                   .cast("array<int>"))
    # a start inside the previous chunk's tail would emit a pure-suffix
    # duplicate: drop starts past n - overlap except the very first
    starts = F.filter(starts,
                      lambda s: (s == 1) | (s + overlap <= F.col("_n")))
    exploded = staged.select(
        *keep, "_toks",
        F.posexplode(starts).alias("_pos", "_start"))
    return exploded.select(
        *keep,
        F.col("_pos").alias("chunk_id"),
        F.array_join(F.slice("_toks", F.col("_start"), size), " ")
         .alias("chunk_text"),
        F.least(F.lit(size),
                F.size("_toks") - F.col("_start") + 1).alias("chunk_tokens"))
