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
