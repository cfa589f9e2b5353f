"""Semantic deduplication over an embedding column (SemDeDup).

Implements the published SemDeDup recipe (Abbas et al. 2023,
arXiv:2303.09540): k-means cluster the embeddings, then inside each
cluster drop every member whose cosine similarity to an already-kept
member exceeds a threshold, keeping the exemplar LEAST similar to the
cluster centroid (the paper's choice — it preserves the most atypical
representative of each duplicate group, which their ablations show
trains better than keeping the most typical one).

This is the scale path the pairwise near-dup family (`ops/dedup.py`,
`ops/similarity.py`) doesn't cover: LSH banding bounds candidate pairs
by bucket collisions of a RANDOM projection, while SemDeDup bounds them
by a LEARNED partition of the embedding space — pairwise work is
O(sum c_i^2) over cluster sizes instead of O(n^2), and the cluster
count is the knob that trades recall for cost.

Spark shape (designed for 10^12 rows):
  1. coarse quantizer: reuse ``ivf_build`` (MLlib kmeans||, spherical
     via L2-normalized features, trainable on a ``train_fraction``
     sample); the assignment pass is one JVM-side model transform over
     the full corpus — no Python;
  2. cluster-size census: one agg over ints, joined back as a BROADCAST
     (num_centroids rows) to derive a deterministic sub-split salt for
     clusters above ``max_cluster`` — the skew guard. A split cluster
     can miss duplicates that straddle its sub-buckets (same recall
     trade LSH banding makes); split membership is surfaced in the
     ``cluster_split`` output column so the caller can measure it;
  3. greedy dedup per (cluster, salt) group via ``applyInPandas`` —
     ONE shuffle of the embedding vectors, then a numpy greedy scan per
     group, Arrow-batched. Groups up to 8192 rows use one BLAS gram
     matrix (<= 512 MB); larger groups score candidates against the
     kept rows only, so executor memory is bounded by
     ``max_cluster * dim * 8`` bytes (the vectors themselves) — never
     by a ``max_cluster^2`` similarity matrix.

Verdict columns only come back (id, cluster, centroid_sim, keep,
cluster_split) — the embeddings never leave the grouped stage, so the
caller's join-back is the only place document-sized data moves.

Reference parity note: the reference repo has no embedding surface;
this implements the graft brief's training-data capability from the
published paper.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import ivf_build

__all__ = ["semdedup", "semdedup_stats"]


def _greedy_keep(mat: np.ndarray, centroid: np.ndarray,
                 threshold: float) -> tuple[np.ndarray, np.ndarray]:
    """(keep mask, centroid cosine) for one cluster's row-stacked vectors.

    Rows must already be ordered the way ties should break (ascending id);
    the scan itself visits members in ascending centroid-similarity order
    per the paper. Zero vectors have undefined cosine — they score 0
    against everything and are always kept."""
    norms = np.linalg.norm(mat, axis=1)
    safe = np.where(norms == 0.0, 1.0, norms)
    unit = mat / safe[:, None]
    cn = np.linalg.norm(centroid)
    csim = unit @ (centroid / cn if cn else centroid)
    # ascending centroid similarity = most atypical first (stable sort:
    # equal csim falls back to the caller's ascending-id row order)
    order = np.argsort(csim, kind="stable")
    keep = np.zeros(len(mat), dtype=bool)
    kept_idx: list[int] = []
    if len(mat) <= 8192:
        # small group: one BLAS gram matrix (<= 8192^2 * 8B = 512 MB)
        sims = unit @ unit.T
        for i in order:
            if not kept_idx or sims[i, kept_idx].max() < threshold:
                keep[i] = True
                kept_idx.append(int(i))
    else:
        # large group: never materialize the c^2 gram matrix — score each
        # candidate against the KEPT rows only (matvec per item: memory
        # O(c*dim), time still O(c^2*dim) worst case but O(c*k*dim) when
        # dedup bites, which is exactly when groups are large)
        kept_rows = np.empty_like(unit)
        for i in order:
            if (not kept_idx
                    or (kept_rows[:len(kept_idx)] @ unit[i]).max() < threshold):
                keep[i] = True
                kept_rows[len(kept_idx)] = unit[i]
                kept_idx.append(int(i))
    return keep, csim


def semdedup(emb: DataFrame | None = None, *, id_col: str = "vec_id",
             vec_col: str = "embedding", num_centroids: int = 16,
             threshold: float = 0.97, max_cluster: int = 100_000,
             seed: int = 13, max_iter: int = 10,
             train_fraction: float = 1.0,
             index: tuple | None = None) -> DataFrame:
    """Per-row SemDeDup verdicts: (id_col, cluster, centroid_sim,
    semdedup_keep, cluster_split).

    ``semdedup_keep`` marks the rows a threshold-``threshold`` semantic
    dedup retains; filtering and join-back are the caller's (keeps this
    composable — corpus prep joins verdicts to documents, audits count
    them). ``index`` takes a prebuilt ``ivf_build`` result so the
    quantizer trains once per corpus, not once per call (its ``assigned``
    half must carry columns ``neighbor_id, cvec, _centroid``)."""
    if index is None:
        if emb is None:
            raise ValueError("either emb or index must be provided")
        assigned, centroids = ivf_build(emb, num_centroids, id_col, vec_col,
                                        seed, max_iter, train_fraction)
        # the assignment feeds BOTH the size census and the salted group
        # below (two plan subtrees — no ReusedExchange between them);
        # without this the upstream lineage executes once per branch.
        # Callers passing a prebuilt index own its persistence.
        assigned = assigned.persist()
        index = (assigned, centroids)
    assigned, centroids = index  # (neighbor_id, cvec, _centroid)
    cent_mat = np.asarray(centroids, dtype=np.float64)

    sizes = assigned.groupBy("_centroid").agg(F.count("*").alias("_csize"))
    # num_centroids rows: always broadcastable
    with_salt = (assigned
                 .join(F.broadcast(sizes), "_centroid")
                 .withColumn("_nsub",
                             F.ceil(F.col("_csize") / F.lit(max_cluster))
                             .cast("int"))
                 .withColumn("_salt",
                             F.pmod(F.xxhash64(F.col("neighbor_id")),
                                    F.greatest(F.col("_nsub"), F.lit(1)))
                             .cast("int"))
                 .select("neighbor_id", "cvec", "_centroid", "_salt",
                         (F.col("_nsub") > 1).alias("cluster_split")))

    # verdicts keep the caller's id TYPE (the join-back key must not
    # silently become a string)
    id_type = dict(assigned.dtypes)["neighbor_id"]
    out_schema = (f"{id_col} {id_type}, cluster int, centroid_sim double, "
                  "semdedup_keep boolean, cluster_split boolean")

    def _dedup_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame(columns=[id_col, "cluster", "centroid_sim",
                                         "semdedup_keep", "cluster_split"])
        # ascending id = the deterministic tie-break order _greedy_keep
        # relies on for equal centroid similarities
        pdf = pdf.sort_values("neighbor_id", kind="stable")
        mat = np.array([np.asarray(v, dtype=np.float64)
                        for v in pdf["cvec"]])
        cid = int(pdf["_centroid"].iloc[0])
        keep, csim = _greedy_keep(mat, cent_mat[cid], threshold)
        return pd.DataFrame({
            id_col: pdf["neighbor_id"].to_numpy(),
            "cluster": cid,
            "centroid_sim": np.round(csim, 6),
            "semdedup_keep": keep,
            "cluster_split": pdf["cluster_split"].to_numpy(),
        })

    verdicts = (with_salt
                .groupBy("_centroid", "_salt")
                .applyInPandas(_dedup_group, schema=out_schema))
    return verdicts


def semdedup_stats(verdicts: DataFrame) -> DataFrame:
    """One-row accounting over a ``semdedup`` output: totals, kept,
    dropped, and how many rows sat in recall-lossy split clusters."""
    return verdicts.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("semdedup_keep").cast("long")).alias("n_kept"),
        F.sum((~F.col("semdedup_keep")).cast("long")).alias("n_dropped"),
        F.sum(F.col("cluster_split").cast("long")).alias("n_in_split_clusters"),
        F.countDistinct("cluster").alias("n_clusters"),
    )
