"""Learned byte-pair-encoding tokenizer over the corpus (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016).

Upgrades ``textstats.with_token_count``'s BPE-ish proxy (ceil(chars/4)) to a
REAL subword tokenizer trained on the corpus itself, Spark-first:

- ``train_bpe``: whitespace pretokenization via native ``split``/``explode``
  (whole-stage codegen), ONE partial-aggregated shuffle for word counts,
  then a top-``max_words`` histogram cap.  The merge loop itself runs
  driver-side over that bounded histogram — which is the published
  algorithm, not a shortcut: every practical BPE trainer (subword-nmt,
  GPT-2's encoder) trains from an aggregated word-frequency table, and at
  web scale on a sample.  Zipf's law makes the head of the histogram carry
  essentially all pair mass, so the cap changes nothing material.
- ``apply_bpe``: the learned merge table (a few hundred KB) is broadcast;
  encoding is an Arrow-batched pandas UDF with a per-executor
  word -> tokens cache (word frequencies are Zipfian, so the greedy merge
  loop runs roughly once per DISTINCT word, not per occurrence).  The
  operator is map-only — zero shuffles — and composes with the quality /
  mixture rollups that need token budgets.

Determinism is pinned: pair selection is ``max`` over ``(count, pair)`` so
ties break on the lexicographically greatest pair, independent of dict
iteration order; the histogram cap orders by ``(count desc, word asc)``.

Round-trip invariant (tested): joining a word's tokens and stripping the
end-of-word marker reproduces the word exactly, for any input — BPE
segmentations are lossless by construction.

At 100 TB: training is one scan + one count shuffle over a sample
(``sample_fraction``); the collect is bounded by ``max_words`` rows (a
model-build step, like k-means centroids — never corpus-sized); encoding
touches each document once, map-side, with the merge table broadcast once
per executor.

Reference parity note: the reference repo counts whitespace tokens only
(frontend display); this module implements the graft brief's training-data
token-counting capability beyond it.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["train_bpe", "apply_bpe", "encode_word", "decode_tokens", "EOW"]

# End-of-word marker, attached to a word's final character as in subword-nmt
# (so "low" -> ('l', 'o', 'w</w>')).  Multi-char sentinel cannot collide with
# any single input character.
EOW = "</w>"

# re.ASCII pins \s to [ \t\n\r\f\v] — the same set Java's \s matches —
# so pretokenization agrees byte-for-byte with train_bpe's Spark-side
# F.split(_t, r"\s+"): a word containing NBSP (common in extracted HTML)
# must be ONE word on both sides or encode never sees what training
# counted
_WS_SPLIT = re.compile(r"\s+", re.ASCII)


# ---------------------------------------------------------------------------
# Training (driver-side merge loop over the Spark-aggregated histogram)
# ---------------------------------------------------------------------------


def _word_symbols(word: str) -> tuple:
    """('l','o','w</w>') for 'low'; single-char words become ('w</w>',)."""
    return tuple(word[:-1]) + (word[-1] + EOW,)


def _pairs_of(syms: tuple) -> list:
    return [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]


def _merge_word(syms: tuple, pair: tuple, joined: str) -> tuple:
    """Merge every (non-overlapping, left-to-right) occurrence of ``pair``."""
    out = []
    i, n = 0, len(syms)
    a, b = pair
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _merge_loop(histogram: list, num_merges: int, min_count: int) -> list:
    """Classic BPE training over a (word, freq) histogram.

    Incremental pair-count maintenance (the subword-nmt optimization): each
    merge touches only the words that contain the merged pair, so the loop
    is O(merges * affected-words), not O(merges * vocabulary).
    """
    words = [_word_symbols(w) for w, _ in histogram]
    freqs = [c for _, c in histogram]
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)  # pair -> indices of words containing it
    for wi, syms in enumerate(words):
        f = freqs[wi]
        for p in _pairs_of(syms):
            pair_counts[p] += f
            pair_words[p].add(wi)
    merges = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # Deterministic: most frequent pair, ties to the lexicographically
        # greatest — independent of dict order.
        best, best_c = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))
        if best_c < min_count:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for wi in list(pair_words[best]):
            old = words[wi]
            new = _merge_word(old, best, joined)
            f = freqs[wi]
            for p in _pairs_of(old):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pw = pair_words[p]
                pw.discard(wi)
                if not pw:
                    del pair_words[p]
            for p in _pairs_of(new):
                pair_counts[p] += f
                pair_words[p].add(wi)
            words[wi] = new
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 50_000,
    min_count: int = 2,
    sample_fraction: float | None = None,
    seed: int = 7,
) -> list:
    """Learn a rank-ordered BPE merge list from the corpus.

    One scan, one count shuffle, a bounded top-N collect, then the
    published driver-side merge loop.  Returns ``[(sym_a, sym_b), ...]``
    in merge order (rank = list index).
    """
    t = df.select(F.col(text_col).alias("_t")).where(F.col("_t").isNotNull())
    if sample_fraction is not None:
        t = t.sample(fraction=sample_fraction, seed=seed)
    words = (
        t.select(F.explode(F.split("_t", r"\s+")).alias("w"))
        .where(F.length("w") > 0)
    )
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    top = (
        counts.orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()  # bounded by max_words: model build, not corpus collect
    )
    histogram = [(r["w"], r["c"]) for r in top]
    return _merge_loop(histogram, num_merges, min_count)


# ---------------------------------------------------------------------------
# Encoding (map-only Arrow-batched UDF with a per-executor word cache)
# ---------------------------------------------------------------------------


# per-PROCESS word->tokens caches, keyed by merge-table identity and kept
# alive with the table itself (a cache local to the UDF body would be
# rebuilt every Arrow batch, re-running the merge loop for the Zipf-head
# words each ~10k rows). Bounded: last few models, 1M words each.
_WORD_CACHES: dict = {}


def _process_cache(ranks: dict, max_models: int = 4,
                   max_words: int = 1_000_000) -> dict:
    key = id(ranks)
    hit = _WORD_CACHES.get(key)
    if hit is not None:
        cache = hit[1]
        if len(cache) > max_words:
            cache.clear()
        return cache
    while len(_WORD_CACHES) >= max_models:
        _WORD_CACHES.pop(next(iter(_WORD_CACHES)))
    cache: dict = {}
    _WORD_CACHES[key] = (ranks, cache)  # ref keeps id() stable
    return cache


def encode_word(word: str, ranks: dict, cache: dict | None = None) -> list:
    """Greedy BPE segmentation of one word: repeatedly merge the present
    pair with the lowest merge rank (GPT-2 encoder semantics)."""
    if cache is not None:
        hit = cache.get(word)
        if hit is not None:
            return hit
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pair = (syms[best_i], syms[best_i + 1])
        syms = list(_merge_word(tuple(syms), pair, pair[0] + pair[1]))
    if cache is not None:
        cache[word] = syms
    return syms


def decode_tokens(tokens: list) -> str:
    """Lossless inverse of a word's segmentation (strip the EOW marker)."""
    joined = "".join(tokens)
    return joined[: -len(EOW)] if joined.endswith(EOW) else joined


def apply_bpe(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    count_col: str = "bpe_tokens",
    tokens_col: str | None = None,
) -> DataFrame:
    """Add the learned-BPE token count (and optionally the token array).

    Map-only: the merge table rides a broadcast variable, each Arrow batch
    is encoded with a process-local word cache, and no shuffle is
    introduced (plan pinned in tests/test_bpe.py).
    """
    spark = SparkSession.getActiveSession() or df.sparkSession
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)
    want_tokens = tokens_col is not None

    schema = T.StructType([T.StructField("n", T.IntegerType())])
    if want_tokens:
        schema = T.StructType(
            [
                T.StructField("n", T.IntegerType()),
                T.StructField("toks", T.ArrayType(T.StringType())),
            ]
        )

    @F.pandas_udf(schema)
    def _encode(texts: pd.Series) -> pd.DataFrame:
        r = bc.value
        cache = _process_cache(r)
        ns, tok_lists = [], []
        for t in texts:
            if t is None or not t:
                ns.append(0)
                if want_tokens:
                    tok_lists.append([])
                continue
            n = 0
            toks: list = []
            for w in _WS_SPLIT.split(t):
                if not w:
                    continue
                enc = encode_word(w, r, cache)
                n += len(enc)
                if want_tokens:
                    toks.extend(enc)
            ns.append(n)
            if want_tokens:
                tok_lists.append(toks)
        out = {"n": pd.Series(ns, dtype="int32")}
        if want_tokens:
            out["toks"] = pd.Series(tok_lists, dtype="object")
        return pd.DataFrame(out)

    enc = _encode(F.col(text_col))
    out = df.withColumn("_bpe", enc).withColumn(count_col, F.col("_bpe.n"))
    if want_tokens:
        out = out.withColumn(tokens_col, F.col("_bpe.toks"))
    return out.drop("_bpe")
