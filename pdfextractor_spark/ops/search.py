"""Keyword search: TF-IDF / Okapi BM25 ranking over a documents table.

The retrieval primitive every corpus workbench needs next to ANN: exact
lexical ranking (Robertson & Walker's BM25 as published and as shipped in
Lucene — idf = ln((N - df + 0.5)/(df + 0.5) + 1), the non-negative
variant). Spark-first plan, built for a 10^12-doc table:

- tokenization and per-term term frequencies are MAP-SIDE column
  expressions (``regexp_extract_all`` + higher-order ``filter`` per query
  term — the query is a small literal list, so there is no explode and
  the document table is never shuffled);
- corpus statistics (N, avgdl, per-term document frequencies) reduce to
  ONE aggregation row (partial map-side agg), broadcast back via
  ``crossJoin(broadcast(...))``;
- scoring is a pure projection; ``topk`` uses ``orderBy().limit()``
  (TakeOrderedAndProject: per-partition heaps, k rows to the driver).

Scores are rounded (default 4 dp) so floating-point association order
cannot flip equal-score ties across engines; ties then break on doc id.
No reference counterpart (the reference has no search surface); this is
graft-brief capability with a full DuckDB oracle (same math in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tokenize_query", "bm25_search"]

_TOKEN_RX = r"[a-z0-9]+"


def tokenize_query(query: str) -> list[str]:
    """Deterministic query analysis: lowercase alnum runs, first
    occurrence kept, duplicates dropped (BM25 sums each distinct term
    once; repeating a term in the query must not double its weight)."""
    import re

    seen: dict[str, None] = {}
    for t in re.findall(_TOKEN_RX, query.lower()):
        seen.setdefault(t)
    return list(seen)


def bm25_search(docs: DataFrame, query: str, *, id_col: str = "doc_id",
                text_col: str = "text", k1: float = 1.2, b: float = 0.75,
                topk: int | None = 10, round_dp: int = 4) -> DataFrame:
    """Rank ``docs`` against ``query`` by Okapi BM25.

    Returns ``(id_col, score, matched_terms)`` ordered by score desc then
    id asc; ``topk=None`` returns every matching doc (score > 0)."""
    terms = tokenize_query(query)
    if not terms:
        # empty TYPED frame with the id column's REAL type (a string
        # hardcode would make the empty-query schema diverge from the
        # scored schema and break unions/appends on only that path)
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            StructField,
            StructType,
        )

        id_field = docs.schema[id_col]
        return docs.sparkSession.createDataFrame(
            [], StructType([StructField(id_col, id_field.dataType),
                            StructField("score", DoubleType()),
                            StructField("matched_terms", IntegerType())]))
    # null text = empty doc: it still counts toward N and avgdl (matching
    # any offline twin that sees the row), it just cannot match terms
    toks = F.expr(
        f"regexp_extract_all(lower(coalesce({text_col}, '')), '{_TOKEN_RX}', 0)")
    def _tf(term: str):
        # closure via factory: pyspark HOF lambdas must be unary (a second
        # parameter means "element, index"), so default-arg binding is out
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    tf_cols = {f"_tf_{i}": _tf(term) for i, term in enumerate(terms)}
    staged = docs.select(
        F.col(id_col), F.size(toks).alias("_dl"),
        *[c.alias(n) for n, c in tf_cols.items()])
    stats = staged.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[F.sum((F.col(n) > 0).cast("long")).alias(f"_df_{i}")
          for i, n in enumerate(tf_cols)])
    scored = staged.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    matched = F.lit(0)
    for i in range(len(terms)):
        tf = F.col(f"_tf_{i}").cast("double")
        df = F.col(f"_df_{i}").cast("double")
        idf = F.log((F.col("_n") - df + 0.5) / (df + 0.5) + 1.0)
        denom = tf + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
        score = score + F.when(
            tf > 0, idf * tf * (k1 + 1.0) / denom).otherwise(0.0)
        matched = matched + (tf > 0).cast("int")
    out = (scored
           .withColumn("score", F.round(score, round_dp))
           .withColumn("matched_terms", matched)
           .where(F.col("matched_terms") > 0)
           .select(id_col, "score", "matched_terms")
           .orderBy(F.col("score").desc(), F.col(id_col)))
    return out.limit(topk) if topk is not None else out
