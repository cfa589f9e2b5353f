"""Training-corpus cleaning ops: benchmark decontamination + PII redaction.

Two standard stages of an LLM training-data pipeline over the
``documents`` table, both expressed natively (no Python in the plan):

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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_hashes", "contamination_check", "redact_pii", "PII_PATTERNS"]


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
