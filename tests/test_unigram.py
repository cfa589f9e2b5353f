"""Unigram-LM tokenizer (ops/unigram.py): hand-computed E-step, trainer
behavior, Viterbi encode, Spark == pure-Python model equality."""

from __future__ import annotations

import math

from pdfextractor_spark.ops.unigram import (
    _e_step,
    encode_unigram,
    sample_unigram,
    train_unigram,
    unigram_from_histogram,
)


def test_e_step_hand_computed():
    """word 'ab', uniform p=1/3 over {a, b, ab}: segmentations are [ab]
    (1/3) and [a b] (1/9), Z = 4/9 -> E[ab] = 3/4, E[a] = E[b] = 1/4."""
    lp = math.log(1.0 / 3.0)
    logp = {"a": lp, "b": lp, "ab": lp}
    exp = _e_step([("ab", 1)], logp, max_piece_len=2)
    assert abs(exp["ab"] - 0.75) < 1e-12
    assert abs(exp["a"] - 0.25) < 1e-12
    assert abs(exp["b"] - 0.25) < 1e-12
    # frequency weighting scales linearly
    exp4 = _e_step([("ab", 4)], logp, max_piece_len=2)
    assert abs(exp4["ab"] - 3.0) < 1e-12


def test_trainer_keeps_dominant_pieces():
    hist = [("the", 50), ("them", 20), ("theme", 10), ("cat", 5), ("dog", 5)]
    model = unigram_from_histogram(hist, vocab_size=12, max_piece_len=5)
    # every corpus character survives
    chars = {c for w, _ in hist for c in w}
    assert chars <= set(model)
    assert len(model) <= 12 or len(model) == len(chars)
    # the dominant substring becomes a piece and wins its own segmentation
    assert "the" in model
    assert encode_unigram("the", model) == ["the"]
    # probabilities normalize
    assert abs(sum(math.exp(v) for v in model.values()) - 1.0) < 1e-9


def test_viterbi_encode_and_oov():
    logp = {"a": math.log(0.3), "b": math.log(0.3), "ab": math.log(0.4)}
    assert encode_unigram("ab", logp) == ["ab"]       # 0.4 > 0.09
    assert encode_unigram("aab", logp) == ["a", "ab"]
    # unknown single chars fall back to themselves, never stuck
    assert encode_unigram("axb", logp) == ["a", "x", "b"]
    # cache round-trip
    cache: dict = {}
    assert encode_unigram("ab", logp, cache=cache) == ["ab"]
    assert encode_unigram("ab", logp, cache=cache) == ["ab"]


def test_spark_train_equals_python_twin(spark):
    texts = [("the cat sat on the mat",), ("the theme of the talk",),
             ("a cat and a dog",), (None,)]
    df = spark.createDataFrame(texts, "text string")
    model = train_unigram(df, vocab_size=30, max_piece_len=4)

    import re
    from collections import Counter

    words: Counter = Counter()
    for (t,) in texts:
        for w in re.findall(r"[a-z0-9]+", (t or "").lower()):
            words[w] += 1
    hist = sorted(words.items(), key=lambda wc: (-wc[1], wc[0]))
    twin = unigram_from_histogram(hist, vocab_size=30, max_piece_len=4)
    assert model == twin


def test_apply_unigram_counts_and_plan(spark):
    from pdfextractor_spark.ops.unigram import apply_unigram

    logp = {"a": math.log(0.3), "b": math.log(0.3), "ab": math.log(0.4)}
    df = spark.createDataFrame(
        [("x", "ab ab aab"), ("y", ""), ("z", None)], "id string, text string")
    got = {r["id"]: r["unigram_tokens"]
           for r in apply_unigram(df, logp).collect()}
    assert got == {"x": 4, "y": 0, "z": 0}  # [ab] [ab] [a,ab]
    plan = apply_unigram(df, logp)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1


def test_sample_unigram_subword_regularization():
    """Forward-filtering backward-sampling: valid segmentations, the
    right marginal at alpha=1 (P([ab]) = 3/4 on the uniform-vocab 'ab'
    lattice), determinism per (word, seed), Viterbi limit at high alpha."""
    import collections

    lp = math.log(1.0 / 3.0)
    logp = {"a": lp, "b": lp, "ab": lp}
    counts: collections.Counter = collections.Counter()
    for seed in range(4000):
        toks = sample_unigram("ab", logp, alpha=1.0, seed=seed)
        assert "".join(toks) == "ab"
        counts[tuple(toks)] += 1
    share_ab = counts[("ab",)] / 4000
    assert abs(share_ab - 0.75) < 0.03  # exact posterior is 3/4
    # determinism: same (word, seed) -> same sample, on any call
    assert sample_unigram("ab", logp, seed=11) == \
        sample_unigram("ab", logp, seed=11)
    # high alpha concentrates on the Viterbi path
    hi = [tuple(sample_unigram("ab", logp, alpha=50.0, seed=s))
          for s in range(50)]
    assert set(hi) == {("ab",)}
    # alpha=0: uniform over the two segmentations
    zero = collections.Counter(
        tuple(sample_unigram("ab", logp, alpha=0.0, seed=s))
        for s in range(4000))
    assert abs(zero[("ab",)] / 4000 - 0.5) < 0.03
    # OOV chars still segmentable
    assert "".join(sample_unigram("axb", logp, seed=3)) == "axb"
    # negative / oversized seeds are masked, not errors (hash()-derived
    # seeds are negative half the time)
    assert "".join(sample_unigram("ab", logp, seed=-1)) == "ab"
    assert sample_unigram("ab", logp, seed=-1) == \
        sample_unigram("ab", logp, seed=-1)
    assert "".join(sample_unigram("ab", logp, seed=2**70 + 3)) == "ab"


def test_encode_handles_explicit_neg_inf_single_char():
    """A caller-supplied table with an explicit -inf single-char piece
    must take the OOV fallback (not leave the lattice unsegmentable and
    crash the Viterbi backtrace mid-UDF)."""
    import math

    from pdfextractor_spark.ops.unigram import encode_unigram, sample_unigram

    logp = {"a": -1.0, "b": -math.inf, "ab": -1.5}
    assert encode_unigram("ab", logp) == ["ab"]
    # 'b' alone is only reachable through the -inf piece -> OOV fallback
    assert encode_unigram("b", logp) == ["b"]
    assert encode_unigram("ba", logp) == ["b", "a"]
    # the sampler shares the lattice builder: same guarantee
    assert sample_unigram("b", logp) == ["b"]
