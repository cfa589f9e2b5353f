"""SemDeDup (Abbas et al. 2023) semantic dedup: greedy-keep twin, paper
tie-break semantics, split-cluster skew guard, plan shape, real-table
smoke."""

from __future__ import annotations

import numpy as np

from pdfextractor_spark.ops.semdedup import semdedup, semdedup_stats


def _manual_index(spark, rows, centroids):
    """Hand-built (assigned, centroids) index — pins the greedy semantics
    with exact geometry instead of whatever kmeans converges to."""
    assigned = spark.createDataFrame(
        rows, "neighbor_id long, cvec array<double>, _centroid int")
    return assigned, centroids


def test_semdedup_keeps_least_centroid_similar(spark):
    """Two near-duplicates: the one FARTHER from the centroid survives
    (the paper keeps the most atypical exemplar of each duplicate group)."""
    # centroid along +x; a sits almost on it, b is the same direction
    # rotated slightly more -> cos(a,b) ~ 0.9998 > threshold, csim(b) < csim(a)
    a = [float(np.cos(0.05)), float(np.sin(0.05))]
    b = [float(np.cos(0.07)), float(np.sin(0.07))]
    c = [0.0, 1.0]  # far from both: kept independently
    idx = _manual_index(
        spark, [(1, a, 0), (2, b, 0), (3, c, 0)], [[1.0, 0.0]])
    got = {r["vec_id"]: r for r in
           semdedup(threshold=0.99, index=idx).collect()}
    assert not got[1]["semdedup_keep"]          # closest to centroid: dropped
    assert got[2]["semdedup_keep"]              # atypical twin: kept
    assert got[3]["semdedup_keep"]
    assert got[2]["centroid_sim"] < got[1]["centroid_sim"]
    assert all(not r["cluster_split"] for r in got.values())


def test_semdedup_identical_group_tie_breaks_on_id(spark):
    """Equal centroid similarity (identical vectors) falls back to
    ascending-id order: the LOWEST id of an identical group is kept."""
    v = [0.6, 0.8]
    idx = _manual_index(
        spark, [(7, v, 0), (3, v, 0), (9, v, 0)], [[1.0, 0.0]])
    got = {r["vec_id"]: r["semdedup_keep"] for r in
           semdedup(threshold=0.99, index=idx).collect()}
    assert got == {3: True, 7: False, 9: False}


def test_semdedup_zero_vectors_always_kept(spark):
    """Zero vectors have undefined cosine — they must never be dropped
    (and must not NaN the group's gram matrix)."""
    idx = _manual_index(
        spark,
        [(1, [0.0, 0.0], 0), (2, [0.0, 0.0], 0), (3, [1.0, 0.0], 0)],
        [[1.0, 0.0]])
    got = {r["vec_id"]: r["semdedup_keep"] for r in
           semdedup(threshold=0.9, index=idx).collect()}
    assert got == {1: True, 2: True, 3: True}


def test_semdedup_greedy_python_twin(spark):
    """Randomized twin: the Spark verdicts equal an independent pure-numpy
    greedy pass over the same clusters/centroids."""
    rng = np.random.default_rng(42)
    cents = [list(rng.normal(size=4)) for _ in range(3)]
    rows = []
    for i in range(60):
        cid = int(rng.integers(0, 3))
        base = np.asarray(cents[cid])
        # half the rows are jittered copies of an earlier row -> real dups
        if i % 2 and rows:
            src = np.asarray(rows[int(rng.integers(0, len(rows)))][1])
            vec = src + rng.normal(scale=1e-4, size=4)
        else:
            vec = base + rng.normal(scale=0.5, size=4)
        rows.append((i, [float(x) for x in vec], cid))
    idx = _manual_index(spark, rows, cents)
    got = {r["vec_id"]: r["semdedup_keep"]
           for r in semdedup(threshold=0.995, index=idx).collect()}

    want = {}
    for cid in range(3):
        members = sorted([r for r in rows if r[2] == cid], key=lambda r: r[0])
        if not members:
            continue
        mat = np.array([m[1] for m in members], dtype=np.float64)
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cent = np.asarray(cents[cid])
        csim = unit @ (cent / np.linalg.norm(cent))
        kept: list[int] = []
        for i in np.argsort(csim, kind="stable"):
            if not kept or max(float(unit[i] @ unit[j]) for j in kept) < 0.995:
                kept.append(int(i))
        for pos, m in enumerate(members):
            want[m[0]] = pos in kept
    assert got == want
    assert sum(got.values()) < len(rows)  # the planted dups actually dropped


def test_semdedup_split_cluster_guard_and_stats(spark):
    """A cluster above max_cluster is salted into sub-buckets: memory stays
    bounded, every member is flagged cluster_split, and each sub-bucket
    independently keeps one of the identical vectors (the documented
    recall trade)."""
    v = [1.0, 0.0]
    idx = _manual_index(
        spark, [(i, v, 0) for i in range(6)], [[1.0, 0.0]])
    out = semdedup(threshold=0.99, max_cluster=2, index=idx)
    rows = out.collect()
    assert all(r["cluster_split"] for r in rows)
    kept = sum(r["semdedup_keep"] for r in rows)
    # ceil(6/2)=3 sub-buckets; hash salting may leave some empty, but at
    # least one and at most 3 exemplars of the identical group survive
    assert 1 <= kept <= 3
    stats = semdedup_stats(out).collect()[0]
    assert stats["n_docs"] == 6
    assert stats["n_kept"] == kept
    assert stats["n_dropped"] == 6 - kept
    assert stats["n_in_split_clusters"] == 6
    assert stats["n_clusters"] == 1


def test_semdedup_plan_shape(spark):
    idx = _manual_index(
        spark, [(i, [float(i), 1.0], i % 2) for i in range(8)],
        [[1.0, 0.0], [0.0, 1.0]])
    out = semdedup(threshold=0.9, index=idx)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one Arrow-grouped stage does all pairwise work; nothing row-at-a-time,
    # nothing quadratic in the plan itself
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_semdedup_end_to_end_on_embeddings_table(spark, sf_dir):
    """Full path including the kmeans quantizer on the real embeddings
    parquet: one verdict per vector, id type preserved, deterministic
    across two runs (fixed seed)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    out = semdedup(emb, num_centroids=8, threshold=0.9, seed=13, max_iter=3)
    rows = out.collect()
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n
    assert dict(out.dtypes)["vec_id"] == dict(emb.dtypes)["vec_id"]
    again = {(r["vec_id"], r["semdedup_keep"])
             for r in semdedup(emb, num_centroids=8, threshold=0.9,
                               seed=13, max_iter=3).collect()}
    assert again == {(r["vec_id"], r["semdedup_keep"]) for r in rows}
    kept = sum(r["semdedup_keep"] for r in rows)
    assert 0 < kept <= n


def test_greedy_incremental_path_equals_gram_path():
    """Groups above the 8192-row gram cutoff take the memory-bounded
    incremental branch — it must produce bit-identical verdicts to the
    full gram-matrix semantics."""
    from pdfextractor_spark.ops.semdedup import _greedy_keep

    rng = np.random.default_rng(7)
    base = rng.normal(size=(900, 8))
    mat = np.vstack([base[i % 900] + rng.normal(scale=1e-5, size=8)
                     for i in range(9000)])
    centroid = rng.normal(size=8)
    keep_inc, csim_inc = _greedy_keep(mat, centroid, 0.999)

    # reference: the gram-matrix greedy, reimplemented locally
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    csim = unit @ (centroid / np.linalg.norm(centroid))
    order = np.argsort(csim, kind="stable")
    sims = unit @ unit.T
    keep_ref = np.zeros(len(mat), dtype=bool)
    kept = []
    for i in order:
        if not kept or sims[i, kept].max() < 0.999:
            keep_ref[i] = True
            kept.append(int(i))

    assert np.array_equal(keep_inc, keep_ref)
    assert np.allclose(csim_inc, csim)
    # ~10x duplication collapses to ~the base count
    assert 850 <= keep_inc.sum() <= 1000
