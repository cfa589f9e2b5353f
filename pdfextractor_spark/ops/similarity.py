"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``: brute-force cosine top-k — the exactness baseline.
  Query side is broadcast (small); the big side is scanned once, scored
  JVM-side with higher-order functions (zip_with/aggregate — no Python),
  and top-k selected per query via window rank. One shuffle on query_id.
- ``lsh_topk``: random-hyperplane (sign-LSH) bucketed variant — the 100 TB
  scale path: candidates come only from matching hash buckets (multi-probe
  over ``num_tables`` independent tables), then exact cosine re-rank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_topk", "lsh_topk", "embedding_norms", "ivf_build", "ivf_topk"]


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def embedding_norms(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", _norm(F.col(vec_col).cast("array<double>")))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, cosine, rank). Self-matches excluded."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cvec"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qvec"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(_dot(F.col("cvec"), F.col("qvec"))
                    / (_norm(F.col("cvec")) * _norm(F.col("qvec"))), 6))
    )
    # rank on the ROUNDED cosine so ordering is reproducible across engines
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
        .orderBy("query_id", "rank")
    )


def _hyperplanes(dim: int, bits: int, num_tables: int, seed: int = 11):
    import random

    rng = random.Random(seed)
    return [
        [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(bits)]
        for _ in range(num_tables)
    ]


def _signature_udf(tables):
    """Vectorized sign-LSH signatures: ONE numpy ``(n, dim) @ (dim, T*bits)``
    matmul per Arrow batch, bits packed per table. Replaces the previous
    Catalyst-literal expression tree (O(tables x bits x dim) ``F.when``
    nodes) whose plan compilation exploded at real embedding dims — the
    plan now carries a single UDF node regardless of dim."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    planes = np.asarray(tables, dtype=np.float64)  # (T, bits, dim)
    n_tables, n_bits, dim = planes.shape
    flat = planes.reshape(n_tables * n_bits, dim).T.copy()  # (dim, T*bits)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    @pandas_udf(ArrayType(LongType()))
    def _sig(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        mat = np.array([
            v if v is not None and len(v) == dim else np.zeros(dim) for v in vecs
        ], dtype=np.float64)
        signs = (mat @ flat) > 0  # (n, T*bits)
        sigs = (signs.reshape(len(mat), n_tables, n_bits) * weights).sum(axis=2)
        return pd.Series(list(sigs.tolist()))

    return _sig


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5, bits: int = 8,
             num_tables: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int | None = None) -> DataFrame:
    """Approximate top-k via sign-LSH bucket join + exact cosine re-rank.

    Recall grows with ``num_tables``; cost per query is bounded by bucket
    size (~N / 2^bits per table) instead of N."""
    if dim is None:
        first = corpus.select(F.size(vec_col).alias("d")).limit(1).collect()
        dim = first[0]["d"] if first else 0
    tables = _hyperplanes(dim, bits, num_tables)
    sig_udf = _signature_udf(tables)

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cvec"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qvec"))
    c_sig = c.withColumn("sig", sig_udf(F.col("cvec"))).select(
        "neighbor_id", "cvec", F.posexplode("sig").alias("table", "bucket"))
    q_sig = q.withColumn("sig", sig_udf(F.col("qvec"))).select(
        "query_id", "qvec", F.posexplode("sig").alias("table", "bucket"))
    cand = (
        c_sig.join(F.broadcast(q_sig), ["table", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qvec", "neighbor_id", "cvec")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine", F.round(_dot(F.col("cvec"), F.col("qvec")) / (_norm(F.col("cvec")) * _norm(F.col("qvec"))), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: kmeans|| coarse quantizer -> probe-bucket search
# ---------------------------------------------------------------------------


def ivf_build(corpus: DataFrame, num_centroids: int = 16, id_col: str = "vec_id",
              vec_col: str = "embedding", seed: int = 13, max_iter: int = 10,
              train_fraction: float = 1.0):
    """Train a coarse quantizer (MLlib KMeans, kmeans|| init — the
    distributed-by-design initializer) and assign every corpus vector to its
    nearest centroid.

    Returns (assigned_df with ``_centroid`` int column, centroids list).
    At 100 TB you train on ``train_fraction`` << 1 (centroid quality needs
    only a sample) while the assignment pass scans the full corpus once,
    JVM-side, via the fitted model's transform."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # L2-normalize before clustering: euclidean kmeans on unit vectors ==
    # spherical kmeans, so bucket boundaries align with the cosine metric
    # the search ranks by (raw vectors keep cosine scores unchanged).
    feat = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    ).withColumn(
        "_features",
        array_to_vector(F.transform("cvec", lambda x: x / _norm(F.col("cvec")))),
    )
    train = feat.sample(train_fraction, seed=seed) if train_fraction < 1.0 else feat
    model = KMeans(k=num_centroids, seed=seed, maxIter=max_iter,
                   featuresCol="_features", predictionCol="_centroid").fit(train)
    assigned = model.transform(feat).select("neighbor_id", "cvec", "_centroid")
    centroids = [c.tolist() for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(corpus: DataFrame | None, queries: DataFrame, k: int = 5,
             num_centroids: int = 16, nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 13, max_iter: int = 10,
             index: tuple | None = None) -> DataFrame:
    """Approximate top-k cosine via IVF: per query, rank centroids by
    cosine, probe the ``nprobe`` nearest buckets, exact re-rank inside them.

    ``index`` takes a PREBUILT ``(assigned, centroids)`` pair from
    ``ivf_build`` — the scale path: train/assign once, reuse across every
    query batch (the quantizer was previously retrained inside each call,
    which made this the slowest headline query). When ``index`` is None the
    quantizer is built from ``corpus`` for one-shot convenience.

    Centroid ranking is native either way: a literal array expression at
    small ``num_centroids``, a broadcast-joined centroid DataFrame above 64
    (a literal with 65536 x dim lit nodes would melt the optimizer).

    Cost per query ~ nprobe/num_centroids of the corpus instead of all of
    it; recall is tunable via nprobe. Output matches ``cosine_topk``:
    (query_id, neighbor_id, cosine, rank)."""
    if index is None:
        if corpus is None:
            raise ValueError("either corpus or index must be provided")
        index = ivf_build(corpus, num_centroids, id_col, vec_col, seed, max_iter)
    assigned, centroids = index
    n_cent = len(centroids)

    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qvec"))

    if n_cent <= 64:
        cent_arr = F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in centroids])

        def cent_cos(i):
            cv = F.element_at(cent_arr, i + 1)
            return _dot(F.col("qvec"), cv) / (_norm(F.col("qvec")) * _norm(cv))

        # (negated cosine, idx) structs sort ascending => best centroids first
        scored_cents = F.transform(
            F.sequence(F.lit(0), F.lit(n_cent - 1)),
            lambda i: F.struct((-cent_cos(i)).alias("d"), i.alias("i")),
        )
        probes = F.transform(F.slice(F.array_sort(scored_cents), 1, min(nprobe, n_cent)),
                             lambda s: s["i"])
        q_probed = q.select("query_id", "qvec", F.explode(probes).alias("_centroid"))
    else:
        spark = queries.sparkSession
        cent_df = spark.createDataFrame(
            [(i, [float(v) for v in c]) for i, c in enumerate(centroids)],
            "cent_id INT, cvec ARRAY<DOUBLE>",
        )
        cq = q.crossJoin(F.broadcast(cent_df)).withColumn(
            "_ccos", _dot(F.col("qvec"), F.col("cvec"))
            / (_norm(F.col("qvec")) * _norm(F.col("cvec"))),
        )
        wq = Window.partitionBy("query_id").orderBy(F.col("_ccos").desc(), F.col("cent_id"))
        q_probed = (
            cq.withColumn("_cr", F.row_number().over(wq))
            .where(F.col("_cr") <= min(nprobe, n_cent))
            .select("query_id", "qvec", F.col("cent_id").alias("_centroid"))
        )

    cand = (
        assigned.join(F.broadcast(q_probed), "_centroid")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(
            _dot(F.col("cvec"), F.col("qvec")) / (_norm(F.col("cvec")) * _norm(F.col("qvec"))), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
        .orderBy("query_id", "rank")
    )
