"""Data-selection operators (ops/selection.py): hashed-LM exactness vs a
pure-Python twin, DSIR weight math + ranking, deterministic Gumbel top-k
resampling, NB classifier separability + exact scores, broadcast plans."""

import math

import pyspark.sql.functions as F

from pdfextractor_spark.ops.selection import (
    dsir_resample, dsir_weights, hashed_ngram_buckets, score_nb,
    train_hashed_lm, train_nb,
)

_B = 64  # small bucket space so collisions actually occur in tests

_TARGET = [
    ("t1", "quantum field theory lectures on renormalization and symmetry"),
    ("t2", "spectral methods in quantum many body physics research"),
    ("t3", "lecture notes on statistical field theory and symmetry breaking"),
]
_SOURCE = [
    ("s1", "buy cheap pills online free shipping discount pills"),
    ("s2", "casino bonus click here free spins win big jackpot now"),
    ("s3", "cheap replica watches free shipping best discount online"),
]
_MIXED = [
    ("m1", "quantum symmetry research lectures"),       # target-like
    ("m2", "cheap pills free discount online"),         # source-like
    ("m3", "the weather is mild today"),                # neither
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _buckets_of(spark, rows, n, buckets):
    """Per-doc bucket lists via the SAME Spark expression (the hash is the
    bucket assigner; the arithmetic under test is recomputed in Python)."""
    df = _df(spark, rows)
    out = df.select(
        "doc_id", hashed_ngram_buckets(F.col("text"), n, buckets).alias("b")
    ).collect()
    return {r["doc_id"]: list(r["b"]) for r in out}


def _py_lm(bucket_lists, buckets):
    counts = {}
    total = 0
    for bs in bucket_lists:
        for b in bs:
            counts[b] = counts.get(b, 0) + 1
            total += 1
    logp = {b: math.log((c + 1.0) / (total + buckets)) for b, c in counts.items()}
    floor = math.log(1.0 / (total + buckets))
    return logp, floor


def test_train_hashed_lm_matches_pure_python(spark):
    n, rows = 2, _TARGET
    got = {
        r["bucket"]: r["logp"]
        for r in train_hashed_lm(_df(spark, rows), n=n, buckets=_B).collect()
    }
    bl = _buckets_of(spark, rows, n, _B)
    logp, _ = _py_lm(bl.values(), _B)
    assert set(got) == set(logp)
    for b, v in logp.items():
        assert abs(got[b] - v) < 1e-12


def test_dsir_weights_exact_and_ranking(spark):
    n = 2
    tgt = train_hashed_lm(_df(spark, _TARGET), n=n, buckets=_B)
    src = train_hashed_lm(_df(spark, _SOURCE), n=n, buckets=_B)
    w = {
        r["id"]: (r["n_feats"], r["log_weight"])
        for r in dsir_weights(_df(spark, _MIXED), tgt, src, n=n, buckets=_B).collect()
    }
    # exact twin
    lp_t, fl_t = _py_lm(_buckets_of(spark, _TARGET, n, _B).values(), _B)
    lp_s, fl_s = _py_lm(_buckets_of(spark, _SOURCE, n, _B).values(), _B)
    mixed = _buckets_of(spark, _MIXED, n, _B)
    for doc_id, bs in mixed.items():
        expect = sum(lp_t.get(b, fl_t) - lp_s.get(b, fl_s) for b in bs)
        assert w[doc_id][0] == len(bs)
        assert abs(w[doc_id][1] - expect) < 1e-9
    # ranking: with unigram features in a collision-free bucket space,
    # target-vocabulary docs outrank neutral docs outrank source-vocabulary
    # docs (bigrams at 64 buckets are collision-dominated by design above)
    tgt1 = train_hashed_lm(_df(spark, _TARGET), n=1, buckets=4096)
    src1 = train_hashed_lm(_df(spark, _SOURCE), n=1, buckets=4096)
    w1 = {
        r["id"]: r["log_weight"]
        for r in dsir_weights(_df(spark, _MIXED), tgt1, src1, n=1, buckets=4096).collect()
    }
    assert w1["m1"] > w1["m3"] > w1["m2"]
    # model joins stay broadcast: no sort-merge join in the plan
    plan = dsir_weights(_df(spark, _MIXED), tgt, src, n=n, buckets=_B) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


def test_dsir_resample_deterministic_gumbel_topk(spark):
    docs = _df(spark, [(f"d{i}", f"doc number {i}") for i in range(20)])
    weights = spark.createDataFrame(
        [(f"d{i}", 1000.0 if i == 7 else float(-i)) for i in range(20)],
        "id string, log_weight double",
    )
    a = sorted(r["doc_id"] for r in dsir_resample(docs, weights, 5, seed=17).collect())
    b = sorted(r["doc_id"] for r in dsir_resample(docs, weights, 5, seed=17).collect())
    assert a == b and len(a) == 5
    assert "d7" in a  # overwhelming weight is always kept
    full = sorted(r["doc_id"] for r in dsir_resample(docs, weights, 50, seed=17).collect())
    assert len(full) == 20  # k beyond n keeps everything


def test_nb_classifier_separable_and_exact(spark):
    train = spark.createDataFrame(
        [(t, "good") for _, t in _TARGET] + [(t, "spam") for _, t in _SOURCE],
        "text string, label string",
    )
    model, priors = train_nb(train, n=1, buckets=_B)
    assert [p[0] for p in priors] == ["good", "spam"]
    assert abs(priors[0][1] - math.log(0.5)) < 1e-12  # balanced priors
    test_docs = _df(spark, _MIXED + [("m4", "")])
    got = {
        r["id"]: (r["pred_label"], r["best_logp"])
        for r in score_nb(test_docs, model, priors, n=1, buckets=_B).collect()
    }
    assert got["m1"][0] == "good"
    assert got["m2"][0] == "spam"
    assert "m4" not in got or got["m4"][0] is None  # featureless doc
    # exact score for m1 under the 'good' class, recomputed in Python
    lp, fl = _py_lm(_buckets_of(spark, _TARGET, 1, _B).values(), _B)
    m1 = _buckets_of(spark, _MIXED, 1, _B)["m1"]
    expect = math.log(0.5) + sum(lp.get(b, fl) for b in m1)
    assert abs(got["m1"][1] - round(expect, 6)) < 1e-6
    # scoring plan: model join is broadcast
    plan = score_nb(test_docs, model, priors, n=1, buckets=_B) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


def test_short_and_featureless_docs_do_not_crash(spark):
    """Regression: sequence(1,0) counts DOWN in Spark — unguarded, a doc
    with fewer than n tokens made slice(toks, 0, n) throw and killed the
    stage; and score_nb must emit one row per input id, null for
    featureless docs."""
    docs = _df(spark, [("one", "single"), ("zero", ""), ("two", "two tokens")])
    lm = train_hashed_lm(docs, n=2, buckets=_B)  # must not raise
    assert lm.count() >= 1
    w = dsir_weights(docs, lm, lm, n=2, buckets=_B)
    got = {r["id"]: r["log_weight"] for r in w.collect()}
    assert "two" in got  # the only doc with a bigram
    assert "one" not in got and "zero" not in got  # no features -> no weight
    # NB: featureless docs present with null prediction
    train = spark.createDataFrame([("single token text", "a")],
                                  "text string, label string")
    model, priors = train_nb(train, n=1, buckets=_B)
    rows = {r["id"]: r["pred_label"]
            for r in score_nb(docs, model, priors, n=1, buckets=_B).collect()}
    assert set(rows) == {"one", "zero", "two"}
    assert rows["zero"] is None
    assert rows["one"] == "a"


def test_dsir_resample_large_k_path_matches_exact_and_plan_safe(spark):
    # the scale path (quantile cutoff + distributed exact rank) must pick
    # the IDENTICAL top-k set as the exact orderBy().limit() path, and its
    # plan must contain neither a TakeOrderedAndProject (driver-side heap
    # merge of k rows) nor a forced broadcast of the picked ids
    docs = _df(spark, [(f"d{i:03d}", f"doc number {i}") for i in range(400)])
    weights = spark.createDataFrame(
        [(f"d{i:03d}", float((i * 37) % 101) / 10.0) for i in range(400)],
        "id string, log_weight double",
    )
    exact = sorted(r["doc_id"] for r in
                   dsir_resample(docs, weights, 60, seed=17).collect())
    scaled_df = dsir_resample(docs, weights, 60, seed=17, exact_k_threshold=0)
    scaled = sorted(r["doc_id"] for r in scaled_df.collect())
    assert scaled == exact and len(scaled) == 60
    plan = scaled_df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan
    # no driver-sized broadcast: with auto-broadcast off the semi-join must
    # still plan (no F.broadcast hint forcing k ids through the driver)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        cold = dsir_resample(docs, weights, 60, seed=17, exact_k_threshold=0)
        got = sorted(r["doc_id"] for r in cold.collect())
        assert got == exact
        plan2 = cold._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan2
        assert "TakeOrderedAndProject" not in plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_dsir_resample_large_k_tiny_n_and_k_near_n(spark):
    docs = _df(spark, [(f"d{i}", f"text {i}") for i in range(12)])
    weights = spark.createDataFrame(
        [(f"d{i}", float(i)) for i in range(12)], "id string, log_weight double")
    # n <= k on the scale path keeps everything
    assert len(dsir_resample(docs, weights, 20, exact_k_threshold=0)
               .collect()) == 12
    # k close to n (quantile clamps to the whole set) still exact
    exact = sorted(r["doc_id"] for r in dsir_resample(docs, weights, 11).collect())
    scaled = sorted(r["doc_id"] for r in
                    dsir_resample(docs, weights, 11, exact_k_threshold=0).collect())
    assert scaled == exact


def test_dsir_resample_exact_path_has_no_forced_broadcast(spark):
    """The exact (k <= exact_k_threshold) path carries NO F.broadcast hint:
    AQE broadcasts a k-row build side on its own, and a caller raising
    exact_k_threshold must not be able to force a driver-sized broadcast
    through a hard-coded hint. Either join strategy is acceptable — the
    pin is that the plan still builds and stays exact with auto-broadcast
    disabled (a hint would force broadcast regardless)."""
    docs = _df(spark, [(f"d{i:03d}", f"doc number {i}") for i in range(100)])
    weights = spark.createDataFrame(
        [(f"d{i:03d}", float((i * 37) % 101) / 10.0) for i in range(100)],
        "id string, log_weight double",
    )
    want = sorted(r["doc_id"] for r in
                  dsir_resample(docs, weights, 15, seed=7).collect())
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        cold = dsir_resample(docs, weights, 15, seed=7)
        got = sorted(r["doc_id"] for r in cold.collect())
        assert got == want and len(got) == 15
        plan = cold._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan  # the hint would force it
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
