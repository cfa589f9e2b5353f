"""Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
the SentencePiece unigram model), trained and applied Spark-first.

Algorithm (published):
1. Seed vocabulary: the most frequent substrings (length <= max_piece_len)
   of the corpus words, frequency-weighted, plus every single character
   (characters are never pruned, so every word stays segmentable).
2. EM over the word histogram: the E-step runs forward-backward over each
   word's segmentation lattice to collect expected piece counts under the
   current piece probabilities; the M-step renormalizes.
3. Prune: drop the lowest-expected-count pieces (keeping characters) in
   rounds of ``prune_frac`` until ``vocab_size`` remains, re-running EM
   between rounds. (Kudo ranks pieces by exact likelihood loss; pruning
   by expected count is the standard reimplementation simplification —
   the two orders agree except near ties, and this one is deterministic.)
4. Encoding: Viterbi best segmentation under the final log-probs.

Spark shape mirrors ``ops/bpe.py`` exactly: ONE scan + ONE count shuffle
builds the word histogram, a bounded top-``max_words`` collect feeds the
driver-side training loop (a model build over the Zipf head, not a corpus
collect), and encoding is a map-only Arrow-batched UDF with the model in
the closure (broadcast by pickling) and a per-process word cache.

No reference counterpart; graft training-data capability, twin-tested
(the trainer is pure Python, so the Spark side only has to reproduce the
histogram and the encode — both pinned).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_unigram", "encode_unigram", "apply_unigram",
           "sample_unigram", "unigram_from_histogram"]

_NEG_INF = float("-inf")
_MASK64 = (1 << 64) - 1


def _build_spans(word: str, logp: dict, max_piece_len: int,
                 oov_lp: float | None = None) -> list:
    """Shared lattice builder: ``spans[end] = [(start, piece, lp)]`` for
    every vocab piece in the word (plus the single-char OOV fallback at
    ``oov_lp`` when given — the encode/sample paths use it so unknown
    characters never make a word unsegmentable; the E-step does not)."""
    n = len(word)
    spans: list = [[] for _ in range(n + 1)]
    for i in range(n):
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if oov_lp is not None and j - i == 1 \
                    and (lp is None or lp == _NEG_INF):
                # a single char that is missing OR explicitly -inf in a
                # caller-supplied table takes the OOV fallback — otherwise
                # the word becomes unsegmentable and the Viterbi backtrace
                # would walk into a None boundary mid-UDF
                lp = oov_lp
            if lp is not None and lp != _NEG_INF:
                spans[j].append((i, piece, lp))
    return spans


def _seed_vocab(histogram: list, max_piece_len: int, seed_size: int) -> dict:
    """Frequency-weighted substring counts -> top ``seed_size`` pieces
    (every single character is always included)."""
    counts: Counter = Counter()
    chars: set = set()
    for word, freq in histogram:
        n = len(word)
        for i in range(n):
            chars.add(word[i])
            for j in range(i + 1, min(n, i + max_piece_len) + 1):
                counts[word[i:j]] += freq
    multi = [(p, c) for p, c in counts.items() if len(p) > 1]
    # deterministic: count desc, then lexicographic
    multi.sort(key=lambda pc: (-pc[1], pc[0]))
    vocab = {p: float(c) for p, c in multi[: max(0, seed_size - len(chars))]}
    for ch in chars:
        vocab[ch] = float(counts[ch])
    return vocab


def _normalize(counts: dict) -> dict:
    total = sum(counts.values())
    if total <= 0:
        return {p: _NEG_INF for p in counts}
    lt = math.log(total)
    return {p: (math.log(c) - lt if c > 0 else _NEG_INF)
            for p, c in counts.items()}


def _logsumexp(vals: list) -> float:
    m = max(vals)
    if m == _NEG_INF:
        return _NEG_INF
    return m + math.log(sum(math.exp(v - m) for v in vals))


def _e_step(histogram: list, logp: dict, max_piece_len: int) -> dict:
    """Forward-backward expected piece counts over every word's lattice."""
    expected: Counter = Counter()
    for word, freq in histogram:
        n = len(word)
        spans = _build_spans(word, logp, max_piece_len)
        alpha = [_NEG_INF] * (n + 1)
        alpha[0] = 0.0
        for j in range(1, n + 1):
            vals = [alpha[i] + lp for i, _p, lp in spans[j]
                    if alpha[i] != _NEG_INF]
            if vals:
                alpha[j] = _logsumexp(vals)
        if alpha[n] == _NEG_INF:
            continue  # unsegmentable (can't happen while chars survive)
        beta = [_NEG_INF] * (n + 1)
        beta[n] = 0.0
        for j in range(n, 0, -1):
            if beta[j] == _NEG_INF:
                continue
            for i, piece, lp in spans[j]:
                v = lp + beta[j]
                beta[i] = v if beta[i] == _NEG_INF else _logsumexp([beta[i], v])
        z = alpha[n]
        for j in range(1, n + 1):
            if beta[j] == _NEG_INF:
                continue
            for i, piece, lp in spans[j]:
                if alpha[i] == _NEG_INF:
                    continue
                expected[piece] += freq * math.exp(alpha[i] + lp + beta[j] - z)
    return expected


def unigram_from_histogram(histogram: list, vocab_size: int = 400,
                           max_piece_len: int = 8, seed_factor: int = 4,
                           em_iters: int = 2,
                           prune_frac: float = 0.75) -> dict:
    """Pure-Python trainer over a ``[(word, freq), ...]`` histogram.
    Returns ``{piece: log_prob}`` with ``len <= vocab_size`` (never below
    the corpus character count). This IS the twin tests pin against —
    ``train_unigram`` only adds the Spark histogram in front of it."""
    chars = {c for w, _ in histogram for c in w}
    floor = len(chars)
    counts = _seed_vocab(histogram, max_piece_len,
                         max(vocab_size, floor) * seed_factor)
    logp = _normalize(counts)
    while True:
        for _ in range(em_iters):
            expected = _e_step(histogram, logp, max_piece_len)
            # characters survive with an epsilon even at zero expectation
            for ch in chars:
                expected[ch] = max(expected.get(ch, 0.0), 1e-6)
            logp = _normalize({p: c for p, c in expected.items() if c > 0})
        multi = [(p, lp) for p, lp in logp.items() if len(p) > 1]
        target = max(vocab_size - floor, 0)
        if len(multi) <= target:
            break
        keep_n = max(target, int(len(multi) * prune_frac))
        if keep_n == len(multi):  # prune_frac round would remove nothing
            keep_n = target
        # deterministic: highest log-prob first, ties lexicographic
        multi.sort(key=lambda plp: (-plp[1], plp[0]))
        kept = dict(multi[:keep_n])
        logp = {p: lp for p, lp in logp.items() if len(p) == 1 or p in kept}
        if keep_n <= target:
            # final EM pass over the pruned vocab, then done
            for _ in range(em_iters):
                expected = _e_step(histogram, logp, max_piece_len)
                for ch in chars:
                    expected[ch] = max(expected.get(ch, 0.0), 1e-6)
                logp = _normalize({p: c for p, c in expected.items() if c > 0})
            break
    return logp


def train_unigram(df: DataFrame, text_col: str = "text",
                  vocab_size: int = 400, max_piece_len: int = 8,
                  max_words: int = 50_000, em_iters: int = 2,
                  sample_fraction: float | None = None, seed: int = 7) -> dict:
    """Learn a unigram-LM piece table ``{piece: log_prob}`` from the
    corpus: one scan + one count shuffle + a bounded top-N collect (the
    same shape as ``train_bpe``), then the published driver-side loop."""
    t = df.select(F.col(text_col).alias("_t")).where(F.col("_t").isNotNull())
    if sample_fraction is not None:
        t = t.sample(fraction=sample_fraction, seed=seed)
    words = (t.select(F.explode(F.split(F.lower("_t"), r"[^a-z0-9]+")).alias("w"))
             .where(F.length("w") > 0))
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    top = (counts.orderBy(F.col("c").desc(), F.col("w").asc())
           .limit(max_words)
           .collect())  # bounded by max_words: model build, not corpus collect
    histogram = [(r["w"], r["c"]) for r in top]
    return unigram_from_histogram(histogram, vocab_size=vocab_size,
                                  max_piece_len=max_piece_len,
                                  em_iters=em_iters)


def encode_unigram(word: str, logp: dict, max_piece_len: int = 8,
                   cache: dict | None = None) -> list:
    """Viterbi best segmentation of ``word`` under the piece table.
    Out-of-vocabulary characters surface as themselves (single-char
    fallback), matching SentencePiece's byte/char fallback intent."""
    if cache is not None:
        hit = cache.get(word)
        if hit is not None:
            return list(hit)
    n = len(word)
    best = [_NEG_INF] * (n + 1)
    back: list = [None] * (n + 1)
    best[0] = 0.0
    # below any real piece; -inf entries excluded or the fallback itself
    # would be -inf and the lattice unsegmentable
    oov_lp = min((v for v in logp.values() if v != _NEG_INF),
                 default=0.0) - 10.0
    spans = _build_spans(word, logp, max_piece_len, oov_lp)
    for j in range(1, n + 1):
        for i, _piece, lp in spans[j]:
            if best[i] == _NEG_INF:
                continue
            v = best[i] + lp
            if v > best[j]:
                best[j] = v
                back[j] = i
    toks = []
    j = n
    while j > 0:
        i = back[j]
        if i is None:  # defense in depth: never walk off the lattice
            return [word]
        toks.append(word[i:j])
        j = i
    toks.reverse()
    if cache is not None:
        cache[word] = tuple(toks)
    return toks


def sample_unigram(word: str, logp: dict, max_piece_len: int = 8,
                   alpha: float = 1.0, seed: int = 7) -> list:
    """Sample ONE segmentation from the lattice posterior — subword
    regularization (Kudo 2018 §3: training-time tokenization noise that
    makes the downstream model robust to segmentation ambiguity).
    Forward-filtering backward-sampling: forward alphas accumulate
    ``(lp * alpha)``-tempered path mass, then pieces are drawn backward
    from the exact conditional at each boundary. ``alpha`` is the
    inverse temperature: 0 = uniform over segmentations, 1 = the
    unigram posterior, large = approaches Viterbi.

    Deterministic: the RNG is seeded from ``(word, seed)`` via blake2b,
    so the same (word, seed) samples the same segmentation on every
    executor — reproducible corpora, no partitioning dependence."""
    import hashlib
    import random

    n = len(word)
    oov_lp = (min((v for v in logp.values() if v != _NEG_INF),
                  default=0.0) - 10.0)
    spans = [[(i, lp * alpha) for i, _piece, lp in row]
             for row in _build_spans(word, logp, max_piece_len, oov_lp)]
    alpha_f = [_NEG_INF] * (n + 1)
    alpha_f[0] = 0.0
    for j in range(1, n + 1):
        vals = [alpha_f[i] + lp for i, lp in spans[j] if alpha_f[i] != _NEG_INF]
        if vals:
            alpha_f[j] = _logsumexp(vals)
    if alpha_f[n] == _NEG_INF:
        return [word]  # unsegmentable only if n == 0 pathology
    # mask to unsigned 64-bit: callers deriving seeds from hash()/mixes
    # pass negative ints half the time, and to_bytes would raise
    rng = random.Random(int.from_bytes(
        hashlib.blake2b(word.encode("utf-8"), digest_size=8,
                        key=(seed & _MASK64).to_bytes(8, "little")).digest(),
        "little"))
    toks = []
    j = n
    while j > 0:
        cands = [(i, alpha_f[i] + lp) for i, lp in spans[j]
                 if alpha_f[i] != _NEG_INF]
        m = max(v for _i, v in cands)
        weights = [math.exp(v - m) for _i, v in cands]
        pick = rng.random() * sum(weights)
        acc = 0.0
        chosen = cands[-1][0]
        for (i, _v), w in zip(cands, weights):
            acc += w
            if pick <= acc:
                chosen = i
                break
        toks.append(word[chosen:j])
        j = chosen
    toks.reverse()
    return toks


def apply_unigram(df: DataFrame, logp: dict, text_col: str = "text",
                  max_piece_len: int = 8,
                  out_col: str = "unigram_tokens") -> DataFrame:
    """Map-only Arrow-batched token COUNT column (the budget number
    training pipelines need; the token arrays stay executor-side)."""
    import re

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _count(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        rx = re.compile(r"[a-z0-9]+")
        out = []
        for t in texts:
            total = 0
            for w in rx.findall((t or "").lower()):
                total += len(encode_unigram(w, logp, max_piece_len, cache))
            out.append(total)
        return pd.Series(out)

    return df.withColumn(out_col, _count(F.col(text_col)))
