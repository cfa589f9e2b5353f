"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All native column expressions (JVM-side, codegen) —
designed so the identical semantics are expressible in ANSI SQL for the
correctness oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_token_count", "with_quality", "with_lang_guess", "with_fingerprint",
           "with_repetition", "with_compression_ratio", "quality_rollup",
           "langid_confusion"]

# Tiny deterministic stopword votes per language (heuristic n-gram/lexicon
# ID, the CCNet-style cheap gate before any learned model). Insertion order
# IS the tie-break priority: the original four stay first so their
# behavior on existing corpora is unchanged; the round-4 additions follow
# alphabetically. The SQL oracle generates its votes/CASE from this exact
# dict (single source of truth), so extending it keeps Spark == DuckDB by
# construction. Markers are space-padded lowercase function words (CJK
# particles unpadded — no word boundaries to pad against).
_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to "],
    "es": [" el ", " la ", " de ", " que "],
    "fr": [" le ", " la ", " et ", " les "],
    "zh": ["的", "是", "在"],
    "ar": [" في ", " من ", " على ", " أن "],
    "de": [" der ", " und ", " die ", " ist "],
    "it": [" che ", " di ", " il ", " per "],
    "ja": ["の", "に", "は", "を"],
    "ko": ["의", "는", "을", "하"],
    "nl": [" het ", " een ", " van ", " niet "],
    "pl": [" nie ", " jest ", " się ", " do "],
    "pt": [" que ", " uma ", " com ", " os "],
    "ru": [" и ", " не ", " на ", " что "],
    "sv": [" och ", " att ", " det ", " som "],
    "tr": [" bir ", " ve ", " için ", " bu "],
}


def _padded(col):
    return F.concat(F.lit(" "), F.lower(col), F.lit(" "))


def _votes(col, lang):
    padded = _padded(col)
    expr = F.lit(0)
    for m in _LANG_MARKERS[lang]:
        # occurrence count: (len(s) - len(replace(s, m))) / len(m)
        expr = expr + (F.length(padded) - F.length(F.replace(padded, F.lit(m)))) / F.lit(len(m))
    return expr.cast("int")


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Majority stopword vote among the 15 _LANG_MARKERS languages; ties
    resolve in dict-insertion order (en/es/fr/zh first); zero votes ->
    'und'."""
    c = F.col(text_col)
    votes = {lang: _votes(c, lang) for lang in _LANG_MARKERS}
    best = F.greatest(*votes.values())
    guess = F.when(best <= 0, F.lit("und"))
    for lang in _LANG_MARKERS:  # fixed priority order on ties
        guess = guess.when(votes[lang] == best, F.lit(lang))
    return df.withColumn("lang_guess", guess)


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy (ceil(chars/4)) used by training
    pipelines for budget estimates.

    ``regexp_count(\\S+)`` == count of non-empty split(\\s+) pieces, but stays
    inside whole-stage codegen and never materializes a token array (the
    split+higher-order-filter form is ~2x slower at equal semantics)."""
    c = F.col(text_col)
    ws_tokens = F.regexp_count(c, F.lit(r"\S+"))
    return (
        df.withColumn("ws_tokens", ws_tokens)
        .withColumn("approx_bpe_tokens", F.ceil(F.length(c) / F.lit(4.0)).cast("int"))
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / stopword signals + composite score.

    score = 0.4*stopword_share + 0.3*(1-digit_ratio) + 0.3*min(1, chars/500)."""
    c = F.col(text_col)
    n = F.greatest(F.length(c), F.lit(1))
    # translate is a plain char-map (no regex engine) — same count, ~2x faster
    digits = F.length(c) - F.length(F.translate(c, "0123456789", ""))
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    padded = _padded(c)
    stop_hits = F.lit(0)
    for m in _LANG_MARKERS["en"]:
        stop_hits = stop_hits + (F.length(padded) - F.length(F.replace(padded, F.lit(m)))) / F.lit(len(m))
    words = F.greatest(F.regexp_count(c, F.lit(r"\S+")), F.lit(1))
    digit_ratio = digits / n
    punct_ratio = punct / n
    stop_share = F.least(stop_hits / words, F.lit(1.0))
    score = F.lit(0.4) * stop_share + F.lit(0.3) * (F.lit(1.0) - digit_ratio) \
        + F.lit(0.3) * F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    return (
        df.withColumn("digit_ratio", F.round(digit_ratio, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stopword_share", F.round(stop_share, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized content fingerprint: md5 over lowercased, whitespace-
    collapsed, punctuation-stripped text (stable across engines).

    The keep-class is UNICODE letters/digits (``\\p{L}\\p{Nd}``), not
    ``[a-z0-9]``: an ASCII-only class erases every non-Latin script, so
    two DISTINCT CJK/Arabic/Cyrillic documents sharing the same Latin
    residue (a common English boilerplate tail) would collide into one
    fingerprint and dedup as "copies" (round-5 fix; the SQL oracle uses
    the same class — RE2 and Java agree on these properties)."""
    norm = F.trim(F.regexp_replace(F.regexp_replace(
        F.lower(F.col(text_col)), r"[^\p{L}\p{Nd} ]", " "), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))


def quality_rollup(df: DataFrame, text_col: str = "text", group_col: str = "lang") -> DataFrame:
    q = with_quality(with_token_count(df, text_col), text_col)
    return (
        q.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("ws_tokens").alias("total_tokens"),
            # means via DECIMAL sums: the inputs are 6-dp rounded, so a
            # group count of the form 2^a*5^b puts the true mean EXACTLY
            # on a 6-dp rounding midpoint, where double summation order
            # decides the direction — decimal addition is exact
            F.round((F.sum(F.col("quality_score").cast("decimal(28,6)"))
                     / F.count(F.lit(1))).cast("double"), 6)
             .alias("avg_quality"),
            F.round((F.sum(F.col("digit_ratio").cast("decimal(28,6)"))
                     / F.count(F.lit(1))).cast("double"), 6)
             .alias("avg_digit_ratio"),
            F.sum(F.when(F.col("quality_score") >= 0.5, 1).otherwise(0)).alias("high_quality_docs"),
        )
        .orderBy(group_col)
    )


def langid_confusion(df: DataFrame, text_col: str = "text", label_col: str = "lang") -> DataFrame:
    g = with_lang_guess(df, text_col)
    return g.groupBy(F.col(label_col).alias("lang"), "lang_guess").agg(
        F.count(F.lit(1)).alias("docs")
    ).orderBy("lang", "lang_guess")


def with_repetition(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, table A1) as
    native expressions: duplicate-line and duplicate-paragraph fractions
    (distinct-vs-total over trimmed non-empty segments) and the share of
    characters covered by the most frequent word 2-gram (count x gram
    length over doc length — the standard non-overlapping approximation;
    the argmax runs as a sort + longest-run F.aggregate, no UDF). The
    ``repetition_flag`` applies the published thresholds: dup lines
    > 0.30, dup paragraphs > 0.30, top-2-gram chars > 0.20.

    STAGED PROJECTIONS, deliberately: a Column is an expression TREE, so
    deriving the rounded column AND the flag from one ``dup_lines``
    Column embeds a full copy of the split/filter pipeline per use — the
    single-expression shape evaluated the array_sort+aggregate argmax 4x
    and the segment splits 28x PER ROW (HOFs are CodegenFallback, so no
    common-subexpression elimination rescues them). Materializing each
    expensive intermediate as its own column makes downstream uses cheap
    attribute references; CollapseProject leaves multi-referenced
    non-cheap producers alone, so the staging survives optimization."""
    text = F.coalesce(F.col(text_col), F.lit(""))

    def _segs(sep_pattern):
        return F.filter(
            F.transform(F.split(text, sep_pattern), lambda s: F.trim(s)),
            lambda s: s != "")

    def _dup_frac(segs):
        return F.when(F.size(segs) == 0, F.lit(0.0)).otherwise(
            1.0 - F.size(F.array_distinct(segs)) / F.size(segs))

    toks = F.col("_rep_toks")  # staged below: referenced 4x inside grams
    grams = F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat_ws(" ", F.element_at(toks, i),
                                          F.element_at(toks, i + 1))))
    # longest equal-run over the sorted grams = count of the modal 2-gram
    best = F.aggregate(
        F.array_sort(grams),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best"), F.lit("").alias("gram")),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(acc["best"],
                       F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))).alias("best"),
            F.when(F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)) > acc["best"],
                   g).otherwise(acc["gram"]).alias("gram")),
    )
    staged = (df
              .withColumn("_rep_toks",
                          F.filter(F.split(F.lower(F.trim(text)), r"\s+"),
                                   lambda t: t != ""))
              .withColumns({"_rep_segs_l": _segs(r"\n"),
                            "_rep_segs_p": _segs(r"\n{2,}"),
                            "_rep_best": best})
              .withColumns({"_rep_dl": _dup_frac(F.col("_rep_segs_l")),
                            "_rep_dp": _dup_frac(F.col("_rep_segs_p"))}))
    b = F.col("_rep_best")
    top_frac = F.when(F.length(F.trim(text)) == 0, F.lit(0.0)).otherwise(
        F.least(F.lit(1.0),
                b["best"] * F.length(b["gram"]) / F.length(F.trim(text))))
    staged = staged.withColumn("_rep_top", top_frac)
    dl, dp, top = F.col("_rep_dl"), F.col("_rep_dp"), F.col("_rep_top")
    return (staged
            .withColumn("dup_line_frac", F.round(dl, 6))
            .withColumn("dup_para_frac", F.round(dp, 6))
            .withColumn("top_bigram_char_frac", F.round(top, 6))
            .withColumn("repetition_flag",
                        (dl > 0.30) | (dp > 0.30) | (top > 0.20))
            .drop("_rep_toks", "_rep_segs_l", "_rep_segs_p", "_rep_best",
                  "_rep_dl", "_rep_dp", "_rep_top"))


def with_compression_ratio(df: DataFrame, text_col: str = "text",
                           low: float = 0.30, high: float = 0.95,
                           min_bytes: int = 200) -> DataFrame:
    """Per-document zlib compression ratio — the RedPajama-v2/Dolma-style
    quality signal the Gopher rules don't cover: machine-generated or
    heavily templated text compresses far below prose (ratio < ~0.3),
    while random/encrypted junk barely compresses at all (ratio > ~0.95).

    ``compression_ratio`` = deflate(utf-8 bytes) length / raw length
    (level 6, the zlib default, pinned for determinism; empty text -> 1.0).
    ``compression_flag`` marks docs outside [low, high] — but only when
    the document has at least ``min_bytes`` of text: zlib's ~20-byte
    stream overhead pushes EVERY short input over 1.0 (a 56-byte sentence
    measures 1.1), so judging tiny docs would silently purge all short
    legitimate text as "junk". Below the floor the ratio is still
    reported, the flag is false (other gates own short-doc policy).

    zlib is not expressible as a Spark SQL function, so this is an
    Arrow-batched pandas UDF by necessity — one C call per document on
    bytes that already live in the worker, no joins, no shuffle, map-only:
    at 100 TB it pipelines into whatever scan stage calls it. (Plan shape
    pinned in tests/test_cleaning.py.)"""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if not t:
                return 1.0
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one, na_action=None).fillna(1.0)

    text = F.coalesce(F.col(text_col), F.lit(""))
    out = df.withColumn("compression_ratio", F.round(_ratio(text), 6))
    judged = F.octet_length(text) >= min_bytes
    return out.withColumn(
        "compression_flag",
        judged & ((F.col("compression_ratio") < low)
                  | (F.col("compression_ratio") > high)))
