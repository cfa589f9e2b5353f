"""Training-corpus cleaning ops: decontamination, PII redaction, C4
heuristics, corpus-level line dedup.

Standard stages of an LLM training-data pipeline over the ``documents``
table, all expressed natively (no Python in the plan):

- **Decontamination**: flag training documents that share any word
  n-gram (default n=13, the GPT-3/Llama convention) with an evaluation
  benchmark, so benchmark text can be held out of training. N-grams are
  xxhash64-hashed (the comparison needs equality, not content); the
  benchmark side is DISTINCT then broadcast — eval suites are a few
  million grams at most, far under the broadcast threshold at any
  corpus scale — so the only shuffle is the per-doc hit aggregation.

- **PII redaction**: emails / North-American phone numbers / IPv4
  addresses / SSN-shaped ids replaced with typed placeholder tokens,
  with per-kind match counts kept as audit columns (counts computed
  BEFORE replacement). Chained ``regexp_replace`` — map-only.
"""

from __future__ import annotations

import pandas as pd  # module level: pandas_udf resolves pd.Series hints
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ngram_hashes", "contamination_check", "redact_pii", "PII_PATTERNS",
           "c4_clean", "dedup_lines", "dedup_spans", "strip_host_boilerplate",
           "normalize_for_hash", "normalize_unicode"]

# Latin-1 Supplement + Latin Extended-A accent fold as (accented, base)
# pairs — applied AFTER lower(), so only lowercase forms are listed. A
# 1:1 ``translate`` handles these; the few 1:2 expansions (ß ae oe th ij)
# go through ``replace`` below. Precomposed forms fold here; decomposed
# forms (base + combining mark) fold via the \p{M} strip instead, so both
# unicode spellings of "café" normalize identically.
_ACCENT_PAIRS = (
    ("àáâãäå", "a"), ("ç", "c"), ("èéêë", "e"), ("ìíîï", "i"), ("ð", "d"),
    ("ñ", "n"), ("òóôõöø", "o"), ("ùúûü", "u"), ("ýÿ", "y"),
    ("āăą", "a"), ("ćĉċč", "c"), ("ďđ", "d"), ("ēĕėęě", "e"),
    ("ĝğġģ", "g"), ("ĥħ", "h"), ("ĩīĭįı", "i"), ("ĵ", "j"), ("ķ", "k"),
    ("ĺļľŀł", "l"), ("ńņňŋ", "n"), ("ōŏő", "o"), ("ŕŗř", "r"),
    ("śŝşšſ", "s"), ("ţťŧ", "t"), ("ũūŭůűų", "u"), ("ŵ", "w"), ("ŷ", "y"),
    ("źżž", "z"),
)
_ACCENT_SRC = "".join(src for src, _ in _ACCENT_PAIRS)
_ACCENT_DST = "".join(dst * len(src) for src, dst in _ACCENT_PAIRS)


def normalize_for_hash(col) -> Column:
    """CCNet-style aggressive normalization for DEDUP KEYS (Wenzek et al.
    2020 use it before paragraph hashing): lowercase, fold Latin accents
    (precomposed via one ``translate``, decomposed via a combining-mark
    strip), expand the 1:2 ligatures (ß ss, æ ae, œ oe, þ th, ĳ ij), mask
    every unicode digit as ``0``, drop punctuation/symbols/controls, and
    collapse whitespace. Two crawls of the same article that differ only
    in casing, accents-stripped titles, updated view counters, or
    smart-quote styling then hash identically.

    All native expressions — the normalization composes into the same
    map stage as the hash, so using it as a dedup key costs zero extra
    shuffles and no Python. It is a KEY transform, not a text transform:
    the stored document keeps its original bytes."""
    c = F.lower(col if isinstance(col, Column) else F.col(col))
    for ent, rep in (("ß", "ss"), ("æ", "ae"), ("œ", "oe"), ("þ", "th"),
                     ("ĳ", "ij")):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.translate(c, _ACCENT_SRC, _ACCENT_DST)
    c = F.regexp_replace(c, r"\p{M}", "")          # decomposed accents
    c = F.regexp_replace(c, r"\p{Nd}", "0")
    c = F.regexp_replace(c, r"[\p{P}\p{S}]", "")
    # controls (\t \n are Cc) fold into the whitespace collapse, not a
    # bare delete — "spaced\tout" must stay two words
    return F.trim(F.regexp_replace(c, r"[\s\p{C}]+", " "))


def ngram_hashes(col, n: int = 13) -> Column:
    """xxhash64 of every word n-gram of the (lowercased, whitespace-split)
    text — an empty array when the document has fewer than n tokens."""
    c = col if isinstance(col, Column) else F.col(col)
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    m = F.size(toks) - (n - 1)
    return F.when(m <= 0, F.array().cast("array<bigint>")).otherwise(
        F.transform(F.sequence(F.lit(1), m),
                    lambda i: F.xxhash64(F.array_join(F.slice(toks, i, n), " "))))


def contamination_check(docs: DataFrame, benchmark: DataFrame,
                        doc_id: str = "doc_id", text_col: str = "text",
                        bench_text_col: str | None = None,
                        n: int = 13) -> DataFrame:
    """docs + (contaminated_ngrams, is_contaminated): does the document
    share any word n-gram with the benchmark corpus? Benchmark grams are
    deduped and broadcast; doc grams explode map-side into the join, so
    the lone shuffle is the per-doc hit count."""
    bench_grams = (benchmark
                   .select(F.explode(ngram_hashes(bench_text_col or text_col, n))
                           .alias("_gram"))
                   .distinct())
    doc_grams = docs.select(doc_id, F.explode(ngram_hashes(text_col, n)).alias("_gram"))
    hits = (doc_grams.join(F.broadcast(bench_grams), "_gram")
            .groupBy(doc_id)
            .agg(F.countDistinct("_gram").alias("contaminated_ngrams")))
    return (docs.join(hits, doc_id, "left")
            .withColumn("contaminated_ngrams",
                        F.coalesce(F.col("contaminated_ngrams"), F.lit(0)))
            .withColumn("is_contaminated", F.col("contaminated_ngrams") > 0))


# order matters: SSN before phone (both are digit runs with separators)
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # lookarounds instead of \b: a boundary can't sit before '(' and the
    # digit guards also stop partial matches inside longer digit runs
    ("phone", r"(?<!\d)(\+?\d{1,2}[\s.-])?(\(\d{3}\)|\d{3})[\s.-]?\d{3}[\s.-]\d{4}(?!\d)",
     "<PHONE>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text",
               out_col: str | None = None) -> DataFrame:
    """Replace PII spans with typed placeholders and keep per-kind match
    counts (``pii_<kind>`` columns, counted before replacement) plus a
    ``pii_total``. Map-only regexp chain."""
    out_col = out_col or text_col
    df = docs
    text = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for kind, pat, _tok in PII_PATTERNS:
        df = df.withColumn(f"pii_{kind}", F.regexp_count(text, F.lit(pat)))
        counts.append(F.col(f"pii_{kind}"))
    redacted = text
    for _kind, pat, tok in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, tok)
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return df.withColumn(out_col, redacted).withColumn("pii_total", total)


# C4 keeps a line only if it ends in terminal punctuation: period,
# exclamation mark, question mark, or end quotation mark (Raffel et al.
# 2020, "Exploring the Limits of Transfer Learning", section 2.2).
_C4_TERMINAL = r'[.!?]["”’\']?$'


def c4_clean(docs: DataFrame, text_col: str = "text",
             out_col: str | None = None, badwords: list[str] | None = None,
             min_words: int = 3, min_sentences: int = 5) -> DataFrame:
    """C4-style heuristic cleaning (Raffel et al. 2020 §2.2), map-only.

    Line level (drops the line, keeps the document): a line survives only
    if it ends in terminal punctuation, has at least ``min_words``
    whitespace tokens, and does not mention "javascript" (C4 drops those
    as cookie/JS boilerplate). Document level (flags — callers filter on
    ``c4_keep``): pages containing ``{`` (source code), the phrase
    "lorem ipsum", any ``badwords`` token, or ending with fewer than
    ``min_sentences`` sentences in the kept text are marked for removal.

    Output columns: ``out_col`` (cleaned text; defaults to replacing
    ``text_col``), ``c4_lines_kept`` / ``c4_lines_total`` (non-blank),
    ``c4_sentences``, ``c4_has_brace`` / ``c4_has_lorem`` /
    ``c4_has_badword``, and the combined ``c4_keep``.

    Everything is native higher-order functions over the line split —
    no Python in the plan and no shuffle, so it composes into the same
    scan stage as the extraction UDFs at any corpus size. ``badwords``
    is folded into a literal array (the published LDNOOBW list is a few
    hundred tokens); a blocklist too large for a literal belongs in a
    broadcast join instead.
    """
    out_col = out_col or text_col
    text = F.coalesce(F.col(text_col), F.lit(""))

    def _line_ok(l):
        t = F.trim(l)
        return ((F.length(t) > 0)
                & t.rlike(_C4_TERMINAL)
                & (F.size(F.split(t, r"\s+")) >= min_words)
                & ~F.lower(t).contains("javascript"))

    # STAGED PROJECTIONS: the line split, the kept-filter, and the
    # rejoined text are each referenced by several output columns, and a
    # Column is an expression TREE — the single-expression shape split
    # the document 7x and ran the per-line keep predicate 3x per row
    # (HOFs are CodegenFallback: no common-subexpression elimination).
    # Materialized intermediates make the later uses attribute
    # references; CollapseProject leaves multi-referenced non-cheap
    # producers alone.
    staged = (docs
              .withColumn("_c4_lines", F.split(text, "\n"))
              .withColumn("_c4_kept", F.filter(F.col("_c4_lines"), _line_ok))
              .withColumn("_c4_cleaned", F.array_join(F.col("_c4_kept"), "\n")))
    # sentence count over the kept text: terminal-punct runs approximate
    # C4's sentence splitter closely enough for the >=5 threshold
    sentences = F.regexp_count(F.col("_c4_cleaned"),
                               F.lit("[.!?]+[\"”’']?(\\s|$)"))
    toks = F.array_distinct(F.split(F.lower(text), r"[^a-z0-9']+"))
    has_bad = (F.arrays_overlap(toks, F.array(*[F.lit(w.lower()) for w in badwords]))
               if badwords else F.lit(False))
    df = (staged
          .withColumn("c4_lines_total",
                      F.size(F.filter(F.col("_c4_lines"),
                                      lambda l: F.length(F.trim(l)) > 0)))
          .withColumn("c4_lines_kept", F.size(F.col("_c4_kept")))
          .withColumn("c4_sentences", sentences)
          .withColumn("c4_has_brace", text.contains("{"))
          .withColumn("c4_has_lorem", F.lower(text).contains("lorem ipsum"))
          .withColumn("c4_has_badword", has_bad)
          .withColumn(out_col, F.col("_c4_cleaned"))
          .drop("_c4_lines", "_c4_kept", "_c4_cleaned"))
    return df.withColumn(
        "c4_keep",
        (~F.col("c4_has_brace")) & (~F.col("c4_has_lorem"))
        & (~F.col("c4_has_badword")) & (F.col("c4_sentences") >= min_sentences))


def dedup_lines(docs: DataFrame, doc_id: str = "doc_id",
                text_col: str = "text", min_count: int = 2,
                keep: str = "first") -> DataFrame:
    """Corpus-level exact duplicate-line removal (the C4 three-sentence-span
    dedup restated at line granularity, as RefinedWeb/FineWeb do it).

    Any non-blank line whose trimmed form occurs ``min_count``-or-more
    times across the whole corpus is removed from every document
    (``keep='none'``) or from every document except the first occurrence
    by ``(doc_id, position)`` order (``keep='first'``, the C4 policy).
    Blank lines are never counted or dropped, so paragraph structure
    survives.

    Scale shape — detection shuffles integers only; document text moves
    in exactly one place (the final drop-set join-back, broadcast when
    the duplicate set is small — the common case):
      1. explode to ``(doc_id, pos, key)`` where key is a 128-bit pair of
         xxhash64 values (plain 64-bit would risk birthday collisions at
         10^12-line scale, and a collision here silently deletes text);
      2. count keys (one shuffle; duplicate lines collapse map-side in
         the partial aggregate);
      3. join survivors back (AQE broadcasts when the duplicate set is
         small — the common case) and, for ``keep='first'``, rank
         occurrences per key;
      4. regroup drop-positions per document (one shuffle of ints) and
         rebuild the text with an indexed array filter, map-side.
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = (docs
             .select(doc_id, F.posexplode(F.split(text, "\n")).alias("_pos", "_line"))
             .withColumn("_line", F.trim("_line"))
             .where(F.length("_line") > 0)
             .select(doc_id, "_pos",
                     F.xxhash64("_line").alias("_h1"),
                     F.xxhash64(F.lit(42), F.col("_line")).alias("_h2")))
    dup_keys = (lines.groupBy("_h1", "_h2").count()
                .where(F.col("count") >= min_count).drop("count"))
    hits = lines.join(dup_keys, ["_h1", "_h2"])
    if keep == "first":
        w = Window.partitionBy("_h1", "_h2").orderBy(F.col(doc_id), F.col("_pos"))
        hits = hits.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") > 1)
    drops = hits.groupBy(doc_id).agg(F.collect_set("_pos").alias("_drop_pos"))
    dropset = F.coalesce(F.col("_drop_pos"), F.array().cast("array<int>"))
    rebuilt = F.array_join(
        F.filter(F.split(text, "\n"), lambda l, i: ~F.array_contains(dropset, i)),
        "\n")
    return (docs.join(drops, doc_id, "left")
            .withColumn(text_col, rebuilt)
            .withColumn("dedup_lines_dropped", F.size(dropset))
            .drop("_drop_pos"))


def dedup_spans(docs: DataFrame, doc_id: str = "doc_id",
                text_col: str = "text", width: int = 50,
                min_count: int = 2, keep: str = "first") -> DataFrame:
    """Corpus-level EXACT-SUBSTRING dedup at ``width``-token granularity
    (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better", the ExactSubstr criterion restated for a distributed plan).

    Any token run of length >= ``width`` that occurs ``min_count``-or-
    more times across the corpus (across documents or repeated inside
    one) is removed from every occurrence (``keep='none'``) or from
    every occurrence except the first by ``(doc_id, position)`` order
    (``keep='first'``, the paper's policy). Detection is EXACT at token
    granularity: a duplicated run of length L >= width shares all of its
    stride-1 ``width``-token windows between copies, so every token of
    the run is covered by some matching window — the window-hash
    multiset over all positions is the distributed stand-in for the
    paper's single-node suffix array.

    Tokens are non-empty ASCII-whitespace splits (Java ``\\s``, the
    Spark `split` semantics — Unicode spaces like NBSP bind their
    neighbors into one token); a document that loses spans
    is rebuilt by joining its surviving tokens with single spaces (a
    token-level operator normalizes whitespace in rewritten documents —
    untouched documents keep their original bytes). Adds
    ``dedup_span_tokens_dropped``.

    Scale shape:
      1. one staged projection computes each document's window-hash
         ARRAYS (two independent xxhash64 per window: 64-bit keys
         birthday-collide at 10^12-window scale, and a collision here
         silently deletes ``width`` tokens of text) — O(n*width) map-side
         CPU, the price of stride-1 exactness without a rolling hash
         (Spark 4's ANSI overflow semantics rule out native Rabin-Karp);
      2. posexplode to ``(doc_id, start, h1, h2)`` — ints only; the
         token arrays and text stay out of the explode, so every
         DETECTION stage (count, rank, regroup) shuffles integers only.
         Document text moves in exactly ONE place: the final join-back
         of the per-doc drop sets (broadcast when small; one Exchange of
         the docs side when ``drops`` outgrows the broadcast threshold —
         unavoidable, the rewrite has to meet its document);
      3. count keys (one shuffle; map-side partial agg), keep counts
         >= min_count; rank occurrences per key for ``keep='first'``;
      4. regroup covered starts per document (one shuffle of ints) and
         rebuild map-side in ONE vectorized Arrow UDF per batch — the
         interval union is a numpy difference-array cumsum (O(n), where
         the equivalent native fold over an accumulator array is
         quadratic for spam documents whose every window is duplicated).
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(F.split(text, r"\s+"), lambda t: t != "")
    n = F.size(F.col("_ds_toks"))
    starts = F.when(n >= width, F.sequence(F.lit(1), n - (width - 1))) \
        .otherwise(F.array().cast("array<int>"))  # sequence(1,0) counts DOWN

    def _whash(seeded: bool):
        def h(p):
            joined = F.array_join(F.slice(F.col("_ds_toks"), p, width), " ")
            return F.xxhash64(F.lit(42), joined) if seeded else F.xxhash64(joined)
        return F.transform(F.col("_ds_starts"), h)

    staged = (docs
              .withColumn("_ds_toks", toks)
              .withColumn("_ds_starts", starts)
              .withColumn("_ds_h1", _whash(False))
              .withColumn("_ds_h2", _whash(True)))
    wins = (staged
            .select(doc_id, F.posexplode(F.arrays_zip("_ds_h1", "_ds_h2"))
                    .alias("_start", "_h"))
            .select(doc_id, "_start",
                    F.col("_h._ds_h1").alias("_h1"),
                    F.col("_h._ds_h2").alias("_h2")))
    dup_keys = (wins.groupBy("_h1", "_h2").count()
                .where(F.col("count") >= min_count).drop("count"))
    hits = wins.join(dup_keys, ["_h1", "_h2"])
    if keep == "first":
        w = Window.partitionBy("_h1", "_h2").orderBy(F.col(doc_id), F.col("_start"))
        hits = hits.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") > 1)
    drops = hits.groupBy(doc_id).agg(F.collect_set("_start").alias("_drop_starts"))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<text:string,dropped:int>")
    def _rebuild(txt: pd.Series, starts_: pd.Series) -> pd.DataFrame:
        import re

        import numpy as np

        # MUST tokenize exactly like the Spark-side F.split(text, r"\s+")
        # above: Java \s is ASCII-only [ \t\n\x0B\f\r], while Python
        # str.split() splits on all Unicode whitespace — an NBSP/U+2028/
        # U+3000 (ubiquitous in crawled HTML) would shift every token
        # index after it and delete the WRONG tokens. re.ASCII pins \s to
        # the identical ASCII class.
        ws = re.compile(r"\s+", re.ASCII)
        out_t, out_d = [], []
        for t, ss in zip(txt, starts_):
            if ss is None or len(ss) == 0:
                out_t.append(t)
                out_d.append(0)
                continue
            tk = [x for x in ws.split(t or "") if x]
            cover = np.zeros(len(tk) + 1, dtype=np.int32)
            # posexplode indices into the windows array == 0-based token
            # starts (the 1-based slice positions live only in _ds_starts)
            s = np.asarray(ss, dtype=np.int64)
            np.add.at(cover, s, 1)
            np.add.at(cover, np.minimum(s + width, len(tk)), -1)
            mask = np.cumsum(cover[:-1]) > 0
            out_t.append(" ".join(tok for tok, m in zip(tk, mask) if not m))
            out_d.append(int(mask.sum()))
        return pd.DataFrame({"text": out_t, "dropped": out_d})

    rebuilt = _rebuild(text, F.coalesce(
        F.col("_drop_starts"), F.array().cast("array<int>")))
    return (docs.join(drops, doc_id, "left")
            .withColumn("_ds_out", rebuilt)
            .withColumn(text_col, F.col("_ds_out.text"))
            .withColumn("dedup_span_tokens_dropped", F.col("_ds_out.dropped"))
            .drop("_drop_starts", "_ds_out"))


def strip_host_boilerplate(docs: DataFrame, doc_id: str = "doc_id",
                           url_col: str = "url", text_col: str = "text",
                           min_docs: int = 2, min_frac: float = 0.5) -> DataFrame:
    """Per-HOST template-line removal (the CCNet/RefinedWeb intra-site
    boilerplate pass): a non-blank line that appears in at least
    ``min_docs`` documents AND at least ``min_frac`` of a host's
    documents is site template chrome (nav menus, footers, cookie
    banners that survived extraction) and is removed from EVERY document
    of that host. Unlike corpus-global ``dedup_lines`` there is no
    keep-first: a template has no first owner, and the global pass at
    realistic thresholds misses per-site chrome entirely (a 40-page
    site's footer is invisible against a 10^12-line corpus count but is
    100% of that site's pages).

    Each input row is one document; ``doc_id`` must be row-unique (the
    caller's contract, same as ``dedup_lines``) and ``url_col`` supplies
    the host via native ``try_parse_url``.

    Scale shape — every detection stage shuffles integers only; document
    text moves in exactly one place (the final per-doc drop-set
    join-back):
      1. explode to ``(host, doc, pos, key)`` where key is a 128-bit
         pair of xxhash64 values (collisions at 10^12-line scale would
         silently delete text);
      2. per-host per-line DISTINCT-document counts: dropDuplicates on
         ``(host, key, doc)`` then count per ``(host, key)`` — two
         int-only exchanges, both partial-aggregated map-side; the
         host-size census is one more int agg over the docs side;
      3. boilerplate keys = counts clearing both thresholds, joined to
         the host census host-wise (census is host-sized — AQE
         broadcasts it at any realistic corpus);
      4. join the exploded lines against the boilerplate keys (hash
         join on ``(host, key)``; the boilerplate side is census-scale,
         so AQE broadcasts it in the common case), regroup drop
         positions per document (one int shuffle) and rebuild the text
         with the same indexed array filter as ``dedup_lines``.
    """
    from .urls import url_host

    if not (0.0 <= min_frac <= 1.0):
        raise ValueError(f"min_frac must be in [0, 1], got {min_frac}")
    text = F.coalesce(F.col(text_col), F.lit(""))
    host = F.coalesce(url_host(url_col), F.lit(""))
    lines = (docs
             .select(F.col(doc_id), host.alias("_host"),
                     F.posexplode(F.split(text, "\n")).alias("_pos", "_line"))
             .withColumn("_line", F.trim("_line"))
             .where(F.length("_line") > 0)
             .select(doc_id, "_host", "_pos",
                     F.xxhash64("_line").alias("_h1"),
                     F.xxhash64(F.lit(42), F.col("_line")).alias("_h2")))
    # distinct-DOC frequency: a line repeated inside one page is spam
    # (Gopher territory), not template evidence
    presence = lines.dropDuplicates(["_host", "_h1", "_h2", doc_id])
    line_docs = presence.groupBy("_host", "_h1", "_h2") \
        .agg(F.count(F.lit(1)).alias("_ndocs"))
    host_docs = docs.select(host.alias("_host")).groupBy("_host") \
        .agg(F.count(F.lit(1)).alias("_hdocs"))
    boiler = (line_docs.join(host_docs, "_host")
              .where((F.col("_ndocs") >= min_docs)
                     & (F.col("_ndocs") >= F.ceil(F.lit(min_frac) * F.col("_hdocs"))))
              .select("_host", "_h1", "_h2"))
    drops = (lines.join(boiler, ["_host", "_h1", "_h2"])
             .groupBy(doc_id).agg(F.collect_set("_pos").alias("_drop_pos")))
    dropset = F.coalesce(F.col("_drop_pos"), F.array().cast("array<int>"))
    rebuilt = F.array_join(
        F.filter(F.split(text, "\n"), lambda l, i: ~F.array_contains(dropset, i)),
        "\n")
    return (docs.join(drops, doc_id, "left")
            .withColumn(text_col, rebuilt)
            .withColumn("host_boilerplate_lines_dropped", F.size(dropset))
            .drop("_drop_pos"))


def normalize_unicode(docs: DataFrame, text_col: str = "text",
                      form: str = "NFC") -> DataFrame:
    """Rewrite ``text_col`` to a canonical Unicode normal form (default
    NFC, the CCNet preprocessing convention; NFKC folds compatibility
    forms — full-width ASCII, ligatures — and is what most tokenizer
    pipelines feed). A crawl mixes precomposed and decomposed text for
    the SAME rendered string (e.g. 'café' as U+00E9 vs e+U+0301), which
    silently splits exact-dedup groups and changes n-gram hashes.

    Spark has no native normalizer, so this is an Arrow-batched UDF by
    necessity — map-only, C-speed ``unicodedata.normalize`` per row,
    with an ``is_normalized`` quick check so already-NFC text (the vast
    majority) costs one scan, zero allocations. Adds
    ``unicode_changed`` marking rows the rewrite actually touched."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normal form {form!r}")

    @pandas_udf("struct<text string, changed boolean>")
    def _norm(texts: pd.Series) -> pd.DataFrame:
        is_norm = unicodedata.is_normalized
        norm = unicodedata.normalize
        out_t, out_c = [], []
        for t in texts:
            if t is None or is_norm(form, t):
                out_t.append(t)
                out_c.append(False)
            else:
                out_t.append(norm(form, t))
                out_c.append(True)
        return pd.DataFrame({"text": out_t, "changed": out_c})

    res = _norm(F.col(text_col))
    return (docs.withColumn("_un", res)
            .withColumn(text_col, F.col("_un.text"))
            .withColumn("unicode_changed", F.col("_un.changed"))
            .drop("_un"))
