"""Hashed n-gram embeddings (ops/embed.py): exact twin, geometry,
end-to-end into semdedup from raw text."""

from __future__ import annotations

import math

from pdfextractor_spark.ops.embed import hashed_embedding_py, with_hashed_embedding


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    da = math.sqrt(sum(x * x for x in a))
    db = math.sqrt(sum(x * x for x in b))
    return num / (da * db) if da and db else 0.0


def test_embedding_matches_exact_twin(spark):
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox jumps over a sleeping dog"),
        ("c", "totally different subject matter entirely here"),
        ("d", ""),
        ("e", None),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {r["id"]: r["embedding"]
           for r in with_hashed_embedding(df).collect()}
    for rid, text in rows:
        assert got[rid] == hashed_embedding_py(text), rid
    # unit norm for non-empty docs, zero vector for empty/null
    for rid in ("a", "b", "c"):
        assert abs(math.sqrt(sum(x * x for x in got[rid])) - 1.0) < 1e-6
    assert got["d"] == [0.0] * 64 and got["e"] == [0.0] * 64


def test_embedding_geometry_and_determinism(spark):
    near_a = "the quick brown fox jumps over the lazy dog every day"
    near_b = "the quick brown fox jumps over the lazy dog every night"
    far = "completely unrelated database query optimizer discussion topic"
    va, vb, vf = (hashed_embedding_py(t) for t in (near_a, near_b, far))
    assert _cos(va, vb) > 0.8 > _cos(va, vf)
    # seed changes the map, dim changes the shape; both deterministic
    assert hashed_embedding_py(near_a, seed=8) != va
    assert len(hashed_embedding_py(near_a, dim=32)) == 32
    assert hashed_embedding_py(near_a) == va


def test_embedding_feeds_semdedup_from_raw_text(spark):
    """End-to-end: raw text -> hashed embeddings -> SemDeDup verdicts.
    Near-duplicate prose falls in one cluster and loses one copy; the
    outlier survives."""
    from pdfextractor_spark.ops.semdedup import semdedup

    base = ("the watershed plan describes sediment reduction practices "
            "and a schedule of monitoring stations for the coming year")
    rows = [("n1", base + " first"), ("n2", base + " second"),
            ("x1", "an entirely different page about jazz harmony theory "
                   "chord voicings and improvisation practice routines")]
    df = with_hashed_embedding(
        spark.createDataFrame(rows, "id string, text string"))
    verdicts = {r["id"]: r["semdedup_keep"] for r in semdedup(
        df, id_col="id", vec_col="embedding", num_centroids=2,
        threshold=0.8, train_fraction=1.0).collect()}
    assert verdicts["x1"]
    assert sorted([verdicts["n1"], verdicts["n2"]]) == [False, True]
    # plan shape: map-only single Arrow stage for the embedding itself
    plan = with_hashed_embedding(
        spark.createDataFrame(rows, "id string, text string")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1
