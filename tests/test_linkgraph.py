"""Link-graph ops (ops/linkgraph.py): outlink extraction semantics, host
graph aggregation, PageRank exactness vs a NumPy power-iteration twin."""

import numpy as np
import pyspark.sql.functions as F

from pdfextractor_spark.ops.linkgraph import extract_outlinks, host_graph, pagerank


def test_extract_outlinks_absolute_and_protocol_relative(spark):
    html = (
        '<a href="https://a.com/x">x</a> '
        "<a href='http://b.org/y?q=1'>y</a> "
        '<a href="//c.net/z">proto-rel</a> '
        '<a href="/relative/path">rel</a> '
        '<a href="mailto:x@y.z">mail</a> '
        '<a href="HTTPS://UPPER.com/">case</a> '
        '<a href="https://frag.com/p#section">frag</a>'
    )
    pages = spark.createDataFrame(
        [("https://src.io/page", bytearray(html, "utf-8"))], "url string, html binary")
    out = sorted(r["outlink"] for r in extract_outlinks(pages).collect())
    assert out == [
        "HTTPS://UPPER.com/",
        "http://b.org/y?q=1",
        "https://a.com/x",
        "https://c.net/z",        # page scheme inherited
        "https://frag.com/p",     # fragment excluded by the scan
    ]
    # map-only: no shuffle
    plan = extract_outlinks(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_host_graph_drops_self_edges_and_counts(spark):
    links = spark.createDataFrame(
        [
            ("https://a.com/1", "https://b.com/x"),
            ("https://a.com/2", "https://b.com/y"),
            ("https://www.a.com/3", "https://a.com/internal"),  # self after www-fold
            ("https://b.com/1", "https://c.com/"),
        ],
        "url string, outlink string",
    )
    got = {(r["src_host"], r["dst_host"]): r["n_links"]
           for r in host_graph(links).collect()}
    assert got == {("a.com", "b.com"): 2, ("b.com", "c.com"): 1}


def _np_pagerank(edges, iters, damping):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, _ in set(edges):
        deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dm = r[deg == 0].sum()
        inflow = np.zeros(n)
        for a, b in set(edges):
            inflow[idx[b]] += r[idx[a]] / deg[idx[a]]
        r = (1 - damping) / n + damping * (inflow + dm / n)
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_twin_and_sums_to_one(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"),            # d has no inlinks
        ("c", "e"),            # e is dangling (no outlinks)
    ]
    edf = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r["node"]: r["rank"] for r in pagerank(edf, iters=12).collect()}
    expect = _np_pagerank(edges, iters=12, damping=0.85)
    assert set(got) == set(expect)
    for v in expect:
        assert abs(got[v] - expect[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # more-linked node outranks the fringe
    assert got["c"] == max(got.values())


def test_pagerank_end_to_end_from_pages(spark):
    def page(url, *targets):
        html = " ".join(f'<a href="{t}">l</a>' for t in targets)
        return (url, bytearray(html, "utf-8"))

    pages = spark.createDataFrame(
        [
            page("https://hub.com/", "https://alpha.io/a", "https://beta.io/b"),
            page("https://alpha.io/a", "https://beta.io/"),
            page("https://beta.io/b", "https://hub.com/back"),
        ],
        "url string, html binary",
    )
    ranks = pagerank(host_graph(extract_outlinks(pages)), iters=8)
    got = {r["node"]: r["rank"] for r in ranks.collect()}
    assert set(got) == {"hub.com", "alpha.io", "beta.io"}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # deterministic
    again = {r["node"]: r["rank"]
             for r in pagerank(host_graph(extract_outlinks(pages)), iters=8).collect()}
    assert again == got
