"""BM25 keyword search (ops/search.py): exact math twin + plan shape."""

from __future__ import annotations

import math

from pdfextractor_spark.ops.search import bm25_search, tokenize_query


def _bm25_twin(rows, query, k1=1.2, b=0.75):
    """Pure-Python BM25 with the same analysis chain."""
    import re

    terms = tokenize_query(query)
    toks = {i: re.findall(r"[a-z0-9]+", (t or "").lower()) for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, _ in rows:
        score, matched = 0.0, 0
        for term in terms:
            tf = toks[i].count(term)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            score += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(toks[i]) / avgdl))
            matched += 1
        if matched:
            out[i] = (round(score, 4), matched)
    return out


def test_tokenize_query():
    assert tokenize_query("Riparian BUFFER, buffer cost-share!") == [
        "riparian", "buffer", "cost", "share"]
    assert tokenize_query("...") == []


def test_bm25_matches_exact_twin(spark):
    rows = [
        ("d1", "Riparian buffer installation along the stream buffer zone."),
        ("d2", "Cost share program for riparian landowners and buffers."),
        ("d3", "Unrelated page about asphalt pavement maintenance."),
        ("d4", "buffer buffer buffer buffer buffer buffer buffer buffer"),
        ("d5", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    query = "riparian buffer"
    got = {r["doc_id"]: (r["score"], r["matched_terms"])
           for r in bm25_search(docs, query, topk=None).collect()}
    assert got == _bm25_twin(rows, query)
    # term saturation: 8x repetition must not dominate a 2-term match
    ranked = [r["doc_id"] for r in bm25_search(docs, query).collect()]
    assert ranked[0] == "d1"
    # topk truncates
    assert len(bm25_search(docs, query, topk=2).collect()) == 2
    # empty query -> empty typed frame; topk=0 -> zero rows, not "all"
    assert bm25_search(docs, "!!!").count() == 0
    assert bm25_search(docs, query, topk=0).count() == 0


def test_bm25_empty_query_schema_matches_scored_schema(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id bigint, text string")
    scored = bm25_search(docs, "alpha")
    empty = bm25_search(docs, "!!!")
    # names + types must match so unions/appends don't fork (nullability
    # flags legitimately differ between computed and literal frames)
    assert [(f.name, f.dataType) for f in empty.schema.fields] == \
        [(f.name, f.dataType) for f in scored.schema.fields]
    assert scored.unionByName(empty).count() == scored.count()


def test_bm25_plan_shape(spark):
    """Doc table is never shuffled: tf columns are map-side, stats is a
    1-row broadcast, topk is TakeOrderedAndProject."""
    docs = spark.createDataFrame(
        [("d1", "alpha beta"), ("d2", "beta gamma")],
        "doc_id string, text string")
    plan = (bm25_search(docs, "alpha beta")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan
    # the only Exchanges allowed are the 1-row stats agg + broadcast —
    # never a hash partitioning of the document table itself
    import re as _re

    assert _re.findall(r"Exchange hashpartitioning[^\n]*", plan) == []
