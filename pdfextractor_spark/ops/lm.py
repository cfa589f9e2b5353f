"""Character n-gram language-model scoring for corpus quality filtering.

The CCNet/Gopher-style pipeline move: train a cheap LM on a trusted slice,
score every document's perplexity under it, and filter/stratify on the
score. Expressed Spark-first:

- ``train_char_lm``: n-grams via native substring explosion (whole-stage
  codegen), ONE shuffle on the gram key for counts, add-one smoothing over
  the observed vocabulary. The model is a small (gram, logp) DataFrame.
- ``score_perplexity``: gram explosion -> BROADCAST join against the model
  (the model is tiny by construction; scoring is map-side, shuffle-free
  until the per-document aggregation) -> per-doc average negative log-prob
  and perplexity. Unseen grams take the smoothed OOV floor
  ``log(1 / (total + V))``.

Every step is arithmetic over counts, so the whole operator has an exact
ANSI-SQL twin — the driver verifies it against DuckDB end to end.

At 100 TB: training runs on a sampled/trusted subset (counts are a single
partial-aggregated shuffle); the model broadcast is a few MB at char-trigram
scale (V <= ~50k in practice); scoring touches each document once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["train_char_lm", "score_perplexity", "ccnet_buckets"]


def _grams_expr(text_col, n: int):
    norm = F.regexp_replace(F.lower(text_col), r"\s+", " ")
    return norm, F.expr(
        f"transform(sequence(1, length(_t) - {n - 1}), i -> substring(_t, i, {n}))"
    )


def train_char_lm(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(gram, logp) model with add-one smoothing: ONE shuffle (gram counts);
    totals folded in via a 1-row cross join (broadcast by AQE)."""
    norm, grams = _grams_expr(F.col(text_col), n)
    g = (
        df.select(norm.alias("_t"))
        .where(F.length("_t") >= n)
        .select(F.explode(grams).alias("gram"))
    )
    counts = g.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(F.sum("c").alias("total"), F.count(F.lit(1)).alias("vocab"))
    return counts.crossJoin(totals).select(
        "gram",
        F.log((F.col("c") + 1.0) / (F.col("total") + F.col("vocab"))).alias("logp"),
        "total", "vocab",
    )


def score_perplexity(df: DataFrame, model: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Per-document (id, n_grams, avg_neg_logp, perplexity) under the model.
    Model side broadcast; unseen grams take log(1/(total+vocab))."""
    norm, grams = _grams_expr(F.col(text_col), n)
    doc_grams = (
        df.select(F.col(id_col).alias("id"), norm.alias("_t"))
        .where(F.length("_t") >= n)
        .select("id", F.explode(grams).alias("gram"))
    )
    m = F.broadcast(model.select("gram", "logp", "total", "vocab"))
    scored = doc_grams.join(m, "gram", "left")
    # OOV floor needs total/vocab even on misses: take them from any model
    # row via a 1-row broadcast of the constants
    consts = F.broadcast(model.select("total", "vocab").limit(1)
                         .withColumnRenamed("total", "_tot").withColumnRenamed("vocab", "_voc"))
    scored = scored.drop("total", "vocab").crossJoin(consts)
    logp = F.coalesce(F.col("logp"), F.log(1.0 / (F.col("_tot") + F.col("_voc"))))
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.avg(-logp).alias("avg_neg_logp"),
        )
        .select(
            "id", "n_grams",
            F.round("avg_neg_logp", 6).alias("avg_neg_logp"),
            F.round(F.exp("avg_neg_logp"), 4).alias("perplexity"),
        )
    )


def ccnet_buckets(df: DataFrame, model: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", lang_col: str = "lang",
                  n: int = 3, mode: str = "approx",
                  accuracy: int = 10_000) -> DataFrame:
    """CCNet's per-language perplexity bucketing (Wenzek et al. 2020 §4.3):
    within each language, docs split into head / middle / tail terciles by
    LM perplexity — head is the cleanest third a training run keeps first.

    Returns ``df`` + ``(perplexity, ppl_bucket)``; docs too short to score
    (< n chars after normalization) carry null perplexity and bucket.

    Two physical strategies, equal up to boundary TIES (docs whose
    rounded perplexity equals a tercile cutoff: the cutoff rule puts
    every tied doc in the lower bucket, the rank rule splits them by
    ``id_col`` — on tie-free data the assignments are identical, which
    the pytest gate pins):

    - ``mode="approx"`` (the 100 TB path): per-language tercile CUTOFFS
      via ``percentile_approx`` — a map-side-partial sketch whose result
      is one tiny row per language, broadcast back; bucket assignment is
      a pure projection. No per-language data shuffle, so a corpus that
      is 50% one language cannot skew a partition.
    - ``mode="exact"``: ``ntile(3)`` over (lang, perplexity, id) — the
      deterministic total order DuckDB replicates exactly (the oracle
      twin); the per-language window shuffle makes it the small-scale /
      verification path, not the production one.

    A null ``lang_col`` forms its own bucket group in BOTH modes (the
    cutoff join is null-safe)."""
    if mode not in ("exact", "approx"):
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    scored = score_perplexity(df, model, text_col=text_col, id_col=id_col,
                              n=n).select(
        F.col("id").alias(id_col), "perplexity")
    out = df.join(scored, id_col, "left")
    names = F.array(F.lit("head"), F.lit("middle"), F.lit("tail"))
    if mode == "exact":
        # ntile must only rank the scored rows: route unscored docs out
        # first or they'd occupy tile slots
        w = Window.partitionBy(lang_col).orderBy("perplexity", id_col)
        scored_part = out.where(F.col("perplexity").isNotNull()) \
            .withColumn("ppl_bucket",
                        F.element_at(names, F.ntile(3).over(w)))
        unscored = out.where(F.col("perplexity").isNull()) \
            .withColumn("ppl_bucket", F.lit(None).cast("string"))
        return scored_part.unionByName(unscored)
    # null-safe group key: a plain lang join would drop null-lang rows'
    # cutoffs (their groupBy row exists but never matches) and mislabel
    # the whole null-lang group 'tail'
    lk = F.coalesce(F.col(lang_col).cast("string"), F.lit("\x00<null>"))
    cuts = F.broadcast(
        out.where(F.col("perplexity").isNotNull())
        .groupBy(lk.alias("_lk"))
        .agg(F.percentile_approx("perplexity", [1.0 / 3, 2.0 / 3],
                                 accuracy).alias("_cuts")))
    joined = out.withColumn("_lk", lk).join(cuts, "_lk", "left")
    bucket = F.when(F.col("perplexity").isNull(), F.lit(None)) \
        .when(F.col("perplexity") <= F.col("_cuts")[0], "head") \
        .when(F.col("perplexity") <= F.col("_cuts")[1], "middle") \
        .otherwise("tail")
    return joined.withColumn("ppl_bucket", bucket).drop("_cuts", "_lk")
