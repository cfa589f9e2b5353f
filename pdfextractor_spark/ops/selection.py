"""Data selection operators: DSIR importance resampling and a one-pass
Naive-Bayes quality classifier over hashed n-gram features.

Two published selection methods web-scale training pipelines run after
cleaning/dedup, expressed Spark-first over shared features:

- Hashed n-gram bag-of-words (the DSIR feature map, Xie et al. 2023,
  "Data Selection for Language Models via Importance Resampling"): word
  n-grams bucketed by ``pmod(xxhash64(gram), buckets)`` — all native
  expressions, whole-stage codegen, no vocabulary state (the bucket space
  IS the vocabulary, so smoothing constants are fixed a priori).
- ``train_hashed_lm``: unigram model over buckets — ONE partial-aggregated
  shuffle; the model is at most ``buckets`` rows (10k default), broadcast
  by construction.
- ``dsir_weights``: per-document importance weight
  ``log w = sum_f [log p_target(f) - log p_source(f)]`` via TWO broadcast
  joins (map-side) and one per-doc aggregation shuffle.
- ``dsir_resample``: deterministic Gumbel top-k — sampling without
  replacement proportional to ``exp(log_weight)`` reduces to keeping the
  top-k of ``log_weight + Gumbel(xxhash64(id, seed))`` (Efraimidis-
  Spirakis / Gumbel-max), which Spark executes as TakeOrderedAndProject:
  no global sort materialization, reproducible under any partitioning.
- ``train_nb`` / ``score_nb``: multinomial Naive Bayes with add-one
  smoothing — the closed-form, single-aggregation-pass cousin of the
  fastText quality classifier used by CCNet/LLaMA-style pipelines
  (wiki-vs-crawl). Training is one shuffle on (label, bucket); scoring
  is a broadcast join + per-doc sum; the argmax rides an array_max over
  (score, label) structs so ties break deterministically to the
  greatest label.

Every step is count arithmetic, so tests pin Spark's numbers against an
independent pure-Python evaluation of the same formulas (the hash only
assigns buckets; the math is verified exactly).

At 100 TB: models are bucket-bounded (never corpus-sized), all model
sides ride broadcasts, per-doc scoring adds exactly one aggregation
shuffle, and the resample's top-k never materializes a global sort.
The only driver-side state is the label list (bounded, a model-build
step like k-means centroids).

Reference parity note: the reference repo has no selection/classifier
surface beyond its deterministic rule classifier (SURVEY §2.12); this
module implements the graft brief's training-data capabilities from the
published methods.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hashed_ngram_buckets", "train_hashed_lm", "dsir_weights",
    "dsir_resample", "train_nb", "score_nb", "train_nb_from_pairs",
    "score_nb_from_pairs",
]

_M31 = 2147483647  # 2^31 - 1: modulus for hash -> uniform(0,1)


def _tokens(text_col):
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda x: x != "")


def hashed_ngram_buckets(text_col, n: int = 2, buckets: int = 10_000):
    """array<int> of hashed word-n-gram bucket ids for one document —
    empty when the document has fewer than ``n`` tokens (guarded:
    ``sequence(1, 0)`` counts DOWN in Spark, so the unguarded transform
    would evaluate ``slice(toks, 0, n)`` and throw)."""
    toks = _tokens(text_col)
    if n == 1:
        grams = toks
    else:
        m = F.size(toks) - (n - 1)
        grams = F.when(m <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), m),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        )
    return F.transform(grams, lambda g: F.pmod(F.xxhash64(g), F.lit(buckets)).cast("int"))


def _doc_buckets(df: DataFrame, id_col: str, text_col: str, n: int,
                 buckets: int, keep_empty: bool = False) -> DataFrame:
    """(id, bucket) pairs; with ``keep_empty`` a featureless document
    contributes one null-bucket sentinel row (explode_outer) so per-doc
    aggregations still see every id without an extra join."""
    explode = F.explode_outer if keep_empty else F.explode
    return df.select(
        F.col(id_col).alias("id"),
        explode(hashed_ngram_buckets(F.col(text_col), n, buckets)).alias("bucket"),
    )


def train_hashed_lm(df: DataFrame, text_col: str = "text", n: int = 2,
                    buckets: int = 10_000) -> DataFrame:
    """(bucket, logp, total) unigram model over hashed n-grams, add-one
    smoothed over the FIXED bucket space (so the OOV floor is
    ``log(1 / (total + buckets))`` with no vocabulary bookkeeping)."""
    b = df.select(F.explode(hashed_ngram_buckets(F.col(text_col), n, buckets)).alias("bucket"))
    counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(F.sum("c").alias("total"))
    return counts.crossJoin(totals).select(
        "bucket",
        F.log((F.col("c") + 1.0) / (F.col("total") + F.lit(float(buckets)))).alias("logp"),
        "total",
    )


def _floored(model: DataFrame, suffix: str, buckets: int):
    """(bucket, logp_<suffix>) plus the 1-row floor constant for misses."""
    m = F.broadcast(model.select("bucket", F.col("logp").alias(f"logp_{suffix}")))
    floor = F.broadcast(
        model.select(
            F.log(1.0 / (F.col("total") + F.lit(float(buckets)))).alias(f"floor_{suffix}")
        ).limit(1)
    )
    return m, floor


def dsir_weights(df: DataFrame, target_model: DataFrame, source_model: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text", n: int = 2,
                 buckets: int = 10_000) -> DataFrame:
    """(id, n_feats, log_weight): importance weight of each document under
    target vs source hashed-n-gram LMs. Model joins are broadcast
    (map-side); the only shuffle is the per-document sum."""
    doc = _doc_buckets(df, id_col, text_col, n, buckets)
    mt, ft = _floored(target_model, "t", buckets)
    ms, fs = _floored(source_model, "s", buckets)
    scored = (
        doc.join(mt, "bucket", "left")
        .join(ms, "bucket", "left")
        .crossJoin(ft)
        .crossJoin(fs)
        .select(
            "id",
            (
                F.coalesce("logp_t", "floor_t") - F.coalesce("logp_s", "floor_s")
            ).alias("_d"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_feats"),
        F.sum("_d").alias("log_weight"),
    )


def dsir_resample(df: DataFrame, weights: DataFrame, k: int,
                  id_col: str = "doc_id", seed: int = 17,
                  exact_k_threshold: int = 500_000) -> DataFrame:
    """Keep k rows of ``df`` sampled without replacement with probability
    proportional to exp(log_weight): deterministic Gumbel top-k keyed on
    ``xxhash64(id, seed)`` — reproducible under any partitioning.

    Two physical paths with IDENTICAL results (both select the top-k by
    ``(_gkey desc, id)``):

    - ``k <= exact_k_threshold``: ``orderBy().limit(k)`` — Spark's
      TakeOrderedAndProject merges per-partition heaps on the driver,
      fine for bounded k — and a broadcast semi-join back to ``df``.
    - large k (the documented 100 TB use: resample a cleaned pool down to
      a 10^7-10^9-doc training set, where a driver merge and a broadcast
      of k ids are both scale-killers): approxQuantile finds a cutoff
      whose rank is guaranteed past k (rank error <= eps*n by the
      Greenwald-Khanna bound, eps sized so the candidate band is
      ~k*(1+delta)); the candidates are range-partitioned on the sort key
      and ranked EXACTLY with a per-partition row_number plus a
      driver-side prefix sum of the bounded per-partition counts (the
      pack_shards two-level trick) — no TakeOrderedAndProject, no
      driver-sized collect, and the final semi-join carries NO broadcast
      hint (AQE picks the strategy for a k-row build side).
    """
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(_M31)) + 0.5) / float(_M31)
    gumbel = -F.log(-F.log(u))
    keyed = weights.select(
        "id", (F.col("log_weight") + gumbel).alias("_gkey")
    )
    if k <= exact_k_threshold:
        # no explicit broadcast hint: AQE already broadcasts a k-row build
        # side at the default threshold, and a caller raising
        # exact_k_threshold must not be able to force a driver-sized
        # broadcast through a hard-coded hint (VERDICT r4 hardening)
        picked = keyed.orderBy(F.col("_gkey").desc(), F.col("id")).limit(k)
        return df.join(picked.select(F.col("id").alias(id_col)), id_col, "semi")
    n = keyed.count()
    if n <= k:
        return df.join(keyed.select(F.col("id").alias(id_col)), id_col, "semi")
    # cutoff c with rank-from-top guaranteed in [k(1+d/2), k(1+3d/2)]:
    # quantile at 1 - k(1+d)/n with rank error eps*n = d*k/2, so
    # {_gkey >= c} surely contains the true top-k and is ~k(1+d) rows
    delta = 0.1
    q_lo = 1.0 - (k * (1.0 + delta)) / n
    if q_lo <= 0.0:
        cand = keyed
    else:
        eps = max(delta * k / (2.0 * n), 1e-7)
        (cutoff,) = keyed.approxQuantile("_gkey", [q_lo], eps)
        cand = keyed.where(F.col("_gkey") >= cutoff)
        if cand.count() < k:  # pathological tie mass / NaN keys: stay exact
            cand = keyed
    spark = df.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # persist AFTER the range partition: the per-partition counts job and
    # the ranking job must observe the SAME partition assignment (range
    # boundaries come from a sampling pass, so recomputation could move
    # boundary rows between partitions otherwise). The cached band is
    # ~k*(1+delta) (id, double) rows spread over the cluster.
    cand = (cand.repartitionByRange(parts, F.col("_gkey").desc(), F.col("id"))
            .withColumn("_pid", F.spark_partition_id())
            .persist())
    sizes = {r["_pid"]: r["cnt"] for r in
             cand.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(sizes):  # range partitions are ordered by the sort key
        offsets[pid] = acc
        acc += sizes[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid in sorted(sizes) for x in (pid, offsets[pid])])
    w = Window.partitionBy("_pid").orderBy(F.col("_gkey").desc(), F.col("id"))
    picked = (cand
              .withColumn("_rk", F.row_number().over(w) + off_map[F.col("_pid")])
              .where(F.col("_rk") <= k)
              .select(F.col("id").alias(id_col)))
    return df.join(picked, id_col, "semi")


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes (hashed features, closed-form one-pass training)
# ---------------------------------------------------------------------------


def train_nb(df: DataFrame, label_col: str = "label", text_col: str = "text",
             n: int = 1, buckets: int = 10_000):
    """Returns (model_df, priors): model is (label, bucket, logp) — at most
    n_labels x buckets rows, ONE shuffle to build; priors is the bounded
    driver-side list [(label, log_prior, floor)] (a model-build collect,
    like k-means centroids)."""
    lb = df.select(
        F.col(label_col).alias("label"),
        F.explode(hashed_ngram_buckets(F.col(text_col), n, buckets)).alias("bucket"),
    )
    return train_nb_from_pairs(
        lb, df.select(F.col(label_col).alias("label")), buckets)


def train_nb_from_pairs(lb: DataFrame, doc_labels: DataFrame, buckets: int):
    """NB model build over PREBUILT (label, bucket) feature pairs —
    shared by the word-n-gram quality classifier above and the char-
    n-gram language identifier (ops/langid.py). ``doc_labels`` is one
    (label) row per training document (for the priors). Same plan shape:
    one (label, bucket) shuffle + bounded label-sized collects."""
    counts = lb.groupBy("label", "bucket").agg(F.count(F.lit(1)).alias("c"))
    label_totals = counts.groupBy("label").agg(F.sum("c").alias("total"))
    model = (
        counts.join(F.broadcast(label_totals), "label")
        .select(
            "label", "bucket",
            F.log((F.col("c") + 1.0) / (F.col("total") + F.lit(float(buckets)))).alias("logp"),
        )
    )
    doc_counts = doc_labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("docs")
    )
    rows = (
        label_totals.join(doc_counts, "label")
        .crossJoin(doc_counts.agg(F.sum("docs").alias("all_docs")))
        .collect()  # bounded by the number of labels
    )
    priors = sorted(
        (
            r["label"],
            math.log(r["docs"] / r["all_docs"]),
            math.log(1.0 / (r["total"] + float(buckets))),
        )
        for r in rows
    )
    return model, priors


def score_nb(df: DataFrame, model: DataFrame, priors: list,
             id_col: str = "doc_id", text_col: str = "text",
             n: int = 1, buckets: int = 10_000) -> DataFrame:
    """(id, pred_label, best_logp): argmax_label [log prior +
    sum_f log p(f|label)] with per-label OOV floors for unseen buckets.
    Scoring is one broadcast join (bucket -> map<label,logp>) + one
    per-document aggregation; ties break to the greatest label string.
    Output has EXACTLY one row per distinct input id — documents with no
    features (empty text) get a null prediction row via an explode_outer
    sentinel (no extra join), so callers can join back without losing
    rows."""
    doc = _doc_buckets(df, id_col, text_col, n, buckets, keep_empty=True)
    return score_nb_from_pairs(doc, model, priors)


def score_nb_from_pairs(doc: DataFrame, model: DataFrame,
                        priors: list) -> DataFrame:
    """NB scoring over PREBUILT (id, bucket) pairs (null-bucket sentinel
    rows = featureless docs) — shared with ops/langid.py."""
    wide = F.broadcast(
        model.groupBy("bucket").agg(
            F.map_from_entries(F.collect_list(F.struct("label", "logp"))).alias("lp")
        )
    )
    joined = doc.join(wide, "bucket", "left")
    per_label = [
        F.sum(
            F.coalesce(F.col("lp").getItem(label), F.lit(floor))
        ).alias(f"_s_{i}")
        for i, (label, _prior, floor) in enumerate(priors)
    ]
    # count only REAL features: the sentinel row's null bucket must not
    # let a featureless doc score the OOV floor and get a prediction
    agg = joined.groupBy("id").agg(
        F.count(F.col("bucket")).alias("_nf"), *per_label)
    candidates = F.array(
        *[
            # struct compare is lexicographic: score first, then label —
            # equal scores break deterministically to the GREATEST label
            F.struct(
                (F.col(f"_s_{i}") + F.lit(prior)).alias("s"),
                F.lit(label).alias("label"),
            )
            for i, (label, prior, _floor) in enumerate(priors)
        ]
    )
    best = F.array_max(F.filter(candidates, lambda c: c["s"].isNotNull()))
    has_features = F.col("_nf") > 0
    return agg.select(
        "id",
        F.when(has_features, best["label"]).alias("pred_label"),
        F.when(has_features, F.round(best["s"], 6)).alias("best_logp"),
    )
