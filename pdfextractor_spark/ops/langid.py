"""Trained char-n-gram language identification (Naive Bayes over hashed
character n-grams).

The scale path next to ``textstats.with_lang_guess``'s stopword vote:
the vote is oracle-clean (its SQL twin is generated from the same marker
dict) but weak on SHORT documents (no marker hits -> 'und') and on
space-free scripts beyond its few CJK particles. Char-n-gram profiles
are the published fix (Cavnar & Trenkle 1994, "N-Gram-Based Text
Categorization"; the same feature family CLD2/fastText langid build on):
3-grams of normalized text separate scripts and languages with a few
hundred training lines per language.

Spark-first shape — identical to the NB quality classifier it reuses
(``ops/selection.py``): features are native expressions (lowercase,
whitespace-squash, leading ``max_chars`` cap, char 3-gram slide, hash
to a FIXED bucket space), training is ONE (label, bucket) shuffle,
the model is at most ``n_langs x buckets`` rows and broadcast for
scoring, and per-doc prediction adds exactly one aggregation shuffle.
The ``max_chars`` cap (default 2000) bounds per-doc feature count: a
language is identifiable from its first kilobytes, so a 100 MB outlier
document must not explode into 10^8 gram rows.

The marker vote stays as the oracle-able twin (driver query
``langid_confusion``); this classifier carries the pytest confusion
gate (multi-script fixtures, short-document wins over the vote).
No reference counterpart; graft-brief text-analysis capability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .selection import score_nb_from_pairs, train_nb_from_pairs

__all__ = ["train_langid", "score_langid", "with_lang_nb",
           "char_ngram_buckets"]


def _norm_text(text_col: Column, max_chars: int) -> Column:
    """Lang-ID normalization: lowercase, squash whitespace runs to one
    space, keep only the first ``max_chars`` chars, pad both edges with
    a space so word-boundary grams exist at the extremes."""
    squashed = F.regexp_replace(F.lower(F.coalesce(text_col, F.lit(""))),
                                r"\s+", " ")
    return F.concat(F.lit(" "), F.substring(squashed, 1, max_chars),
                    F.lit(" "))


def char_ngram_buckets(col: Column, ns: tuple = (1, 2, 3),
                       buckets: int = 4096) -> Column:
    """array<int> of hashed char-n-gram bucket ids, concatenated over the
    orders in ``ns`` (Cavnar & Trenkle profile several orders at once:
    unigrams carry the script, 2/3-grams the language — the mix is what
    keeps SHORT snippets identifiable). Grams of different orders are
    distinct strings, so they hash to independent buckets.

    ``col`` should be a SIMPLE column reference holding pre-normalized
    text (stage ``_norm_text`` as its own projection first): higher-order
    lambdas re-evaluate their body per element, so an embedded
    normalization tree would re-run regexp_replace once per gram."""
    def _order(n: int) -> Column:
        # closure via factory: pyspark HOF lambdas must stay UNARY (a
        # second parameter means "element, index"), so default-arg
        # binding of n would silently receive the index column
        m = F.length(col) - (n - 1)
        return F.when(m <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(F.sequence(F.lit(1), m),
                        lambda i: F.substring(col, i, n)))

    per_order = [_order(n) for n in ns]
    grams = per_order[0] if len(per_order) == 1 else F.concat(*per_order)
    # pure-space grams carry zero language signal but match EVERY profile,
    # so on short snippets they out-shout the real (mostly-unseen) grams
    grams = F.filter(grams, lambda g: F.trim(g) != "")
    return F.transform(
        grams, lambda g: F.pmod(F.xxhash64(g), F.lit(buckets)).cast("int"))


def train_langid(labeled: DataFrame, label_col: str = "lang",
                 text_col: str = "text", ns: tuple = (1, 2, 3),
                 buckets: int = 4096, max_chars: int = 2000):
    """(model_df, priors) from a labeled corpus — same contract as
    ``selection.train_nb`` (model broadcastable by construction)."""
    staged = labeled.select(
        F.col(label_col).alias("label"),
        _norm_text(F.col(text_col), max_chars).alias("_t"))
    lb = staged.select(
        "label",
        F.explode(char_ngram_buckets(F.col("_t"), ns, buckets)).alias("bucket"))
    return train_nb_from_pairs(lb, staged.select("label"), buckets)


def score_langid(df: DataFrame, model: DataFrame, priors: list,
                 id_col: str = "doc_id", text_col: str = "text",
                 ns: tuple = (1, 2, 3), buckets: int = 4096,
                 max_chars: int = 2000) -> DataFrame:
    """(id, pred_label, best_logp) — one row per input id; featureless
    (empty) docs get a null prediction, matching score_nb."""
    staged = df.select(
        F.col(id_col).alias("id"),
        _norm_text(F.col(text_col), max_chars).alias("_t"))
    doc = staged.select(
        "id",
        F.explode_outer(
            char_ngram_buckets(F.col("_t"), ns, buckets)).alias("bucket"))
    return score_nb_from_pairs(doc, model, priors)


def with_lang_nb(df: DataFrame, model: DataFrame, priors: list,
                 id_col: str = "doc_id", text_col: str = "text",
                 out_col: str = "lang_nb", ns: tuple = (1, 2, 3),
                 buckets: int = 4096, max_chars: int = 2000) -> DataFrame:
    """Attach the trained prediction as ``out_col`` (one id-keyed join —
    the scoring aggregation needs the id shuffle anyway; rows with no
    features carry null, mirroring the vote's 'und')."""
    scores = score_langid(df, model, priors, id_col=id_col,
                          text_col=text_col, ns=ns, buckets=buckets,
                          max_chars=max_chars)
    return df.join(
        scores.select(F.col("id").alias(id_col),
                      F.col("pred_label").alias(out_col)),
        id_col, "left")
