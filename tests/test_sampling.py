"""Stratified sampling: exact hash-rank cut and Bernoulli sampleBy."""

import math

import pyspark.sql.functions as F

from pdfextractor_spark.ops.sampling import (
    exact_stratified_sample,
    mixture_report,
    stratified_sample,
)

FRACS = {"en": 0.5, "es": 1.0, "zh": 0.25}


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def test_exact_sample_hits_ceil_counts(spark):
    docs = _docs(spark)
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = {r["lang"]: r["n"] for r in
            exact_stratified_sample(docs, "lang", FRACS, id_col="doc_id")
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, frac in FRACS.items():
        assert kept[lang] == math.ceil(frac * totals[lang]), lang
    # strata without a configured fraction are dropped entirely
    assert set(kept) == set(FRACS)


def test_exact_sample_deterministic_and_seed_sensitive(spark):
    docs = _docs(spark)
    ids = lambda seed: sorted(
        r["doc_id"] for r in
        exact_stratified_sample(docs, "lang", {"en": 0.3}, id_col="doc_id", seed=seed)
        .select("doc_id").collect())
    assert ids(29) == ids(29)          # reproducible
    assert ids(29) != ids(30)          # seed actually changes the pick
    assert len(ids(29)) == len(ids(30))  # but never the count


def test_bernoulli_sample_within_tolerance_and_map_only(spark):
    docs = _docs(spark)
    sampled = stratified_sample(docs, "lang", FRACS, seed=29)
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only filter, no shuffle
    rep = {r["lang"]: r for r in mixture_report(docs, sampled, "lang", FRACS).collect()}
    for lang, frac in FRACS.items():
        achieved = rep[lang]["achieved"]
        n = rep[lang]["total"]
        tol = 4 / math.sqrt(n)  # ~4 sigma of a Bernoulli mean
        assert abs(achieved - frac) <= tol, (lang, achieved, frac, tol)


def test_pack_shards_budget_order_and_plan(spark):
    from pdfextractor_spark.ops.sampling import pack_shards
    from pyspark.sql import Window

    docs = spark.createDataFrame(
        [(f"d{i:03d}", (i * 37) % 900 + 100) for i in range(400)],
        "doc_id string, tokens int",
    )
    budget = 5_000
    out = pack_shards(docs, "tokens", budget, buckets=16)
    rows = out.collect()
    assert len(rows) == 400  # every doc assigned exactly once
    # shard token sums: every shard except the last crosses its budget
    # boundary with its final doc, so sum >= budget - max_doc and
    # sum <= budget + max_doc
    sums = {}
    for r in rows:
        sums[r["shard_id"]] = sums.get(r["shard_id"], 0) + r["tokens"]
    max_doc = max(r["tokens"] for r in rows)
    last = max(sums)
    assert set(sums) == set(range(last + 1))  # contiguous shard ids from 0
    for sid, s in sums.items():
        if sid != last:
            assert budget - max_doc <= s <= budget + max_doc, (sid, s)
    # identical to the naive single global window over the same order
    key = F.xxhash64(F.col("doc_id"), F.lit(43))
    gw = (Window.orderBy(F.pmod(key, F.lit(16)).cast("int"), key, F.col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1))
    naive = docs.withColumn(
        "shard_id",
        F.floor(F.coalesce(F.sum("tokens").over(gw), F.lit(0)) / F.lit(float(5_000))).cast("int"),
    )
    got = {r["doc_id"]: r["shard_id"] for r in rows}
    for r in naive.collect():
        assert got[r["doc_id"]] == r["shard_id"], r["doc_id"]
    # determinism + no single-partition exchange in the scale path
    again = {r["doc_id"]: r["shard_id"] for r in pack_shards(docs, "tokens", budget, buckets=16).collect()}
    assert again == got
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_chunk_documents_semantics_and_plan(spark):
    """Fixed-token chunking: stride coverage, remainder tail kept,
    pure-suffix tail starts dropped, empty docs yield no rows, map-only
    plan (the assembly step between cleaning and shard packing)."""
    from pdfextractor_spark.ops.sampling import chunk_documents

    df = spark.createDataFrame([
        (1, "en", " ".join(f"w{i}" for i in range(25))),
        (2, "en", "a b c"),
        (3, "en", ""),
        (4, "en", None),
        (5, "en", " ".join(f"x{i}" for i in range(10))),  # exactly size
    ], "doc_id long, lang string, text string")
    out = chunk_documents(df, size=10, overlap=2)
    by = {}
    for r in out.collect():
        by.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by[1], key=lambda r: r["chunk_id"])
    # stride 8: starts at tokens 0, 8, 16 (0-based); every token covered
    assert [r["chunk_text"].split()[0] for r in c1] == ["w0", "w8", "w16"]
    assert c1[-1]["chunk_text"].split()[-1] == "w24"
    assert [r["chunk_tokens"] for r in c1] == [10, 10, 9]
    # overlap means consecutive chunks share exactly `overlap` tokens
    assert c1[0]["chunk_text"].split()[-2:] == c1[1]["chunk_text"].split()[:2]
    # short doc: one chunk, true token count; empty/null: no rows
    assert len(by[2]) == 1 and by[2][0]["chunk_tokens"] == 3
    assert 3 not in by and 4 not in by
    # exactly-size doc: one chunk, no empty/pure-suffix second chunk
    assert len(by[5]) == 1 and by[5][0]["chunk_tokens"] == 10
    # deterministic reconstruction: dropping each chunk's leading overlap
    # (after the first) rebuilds the document exactly
    rebuilt = c1[0]["chunk_text"].split()
    for r in c1[1:]:
        rebuilt += r["chunk_text"].split()[2:]
    assert rebuilt == [f"w{i}" for i in range(25)]
    # zero-overlap path and input validation
    nz = chunk_documents(df.where("doc_id = 1"), size=10).collect()
    assert [r["chunk_tokens"] for r in nz] == [10, 10, 5]
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, size=5, overlap=5)
    # map-only: no Exchange, no Python
    plan = chunk_documents(df, 10, 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
