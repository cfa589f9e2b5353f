"""Link-graph analytics over crawled pages: outlink extraction, host graph,
PageRank.

Link structure is a first-class quality signal for web training corpora
(host-level ranks gate inclusion in FineWeb-style pipelines, and the
original use — Page et al. 1999 — was exactly "which crawled pages matter").
Expressed Spark-first:

- ``extract_outlinks``: ``href`` targets via native ``regexp_extract_all``
  over the page markup — map-only, fuses into the scan stage. Absolute
  http(s) links are kept as-is; protocol-relative ``//host/path`` links
  inherit the page's scheme. Relative-path resolution (RFC 3986 merge
  semantics) is deliberately out of scope for the native path — host-graph
  edges only need absolute targets, and a same-page relative link would
  produce a self-edge anyway.
- ``host_graph``: (src_host, dst_host, n_links) — one partial-aggregated
  shuffle; self-edges dropped (they dominate raw counts and carry no
  cross-site information).
- ``pagerank``: standard damped power iteration with dangling-mass
  redistribution. Each iteration is ONE join (ranks onto edges by src) and
  ONE aggregation (contributions by dst) — both on the same key space —
  plus a 1-row dangling-mass aggregate folded in via cross join.
  ``localCheckpoint`` every few iterations truncates the lineage exactly
  as the connected-components operator does (ops/dedup.py), so 20
  iterations do not build a 40-stage plan.

Exactness is pinned against a NumPy power-iteration twin (same damping,
same dangling handling, same iteration count — agreement to 1e-9), plus
the sum(rank)=1 invariant per iteration.

At 100 TB: the edge list is the big table (10^11-10^12 edges at crawl
scale) and every iteration shuffles it ONCE on src (the rank side is
node-sized, orders of magnitude smaller, and AQE broadcasts it per
partition when a host shard is small); contributions aggregate partially
map-side before the dst shuffle. Host-granularity graphs are ~10^8 nodes
— the rank table is a few GB, comfortably a shuffle join, never a
driver collect.

Reference parity note: the reference repo has no link analysis; this
module implements the graft brief's webtext capability from the published
algorithm (Page, Brin, Motwani, Winograd 1999).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .urls import url_host

__all__ = ["extract_outlinks", "host_graph", "pagerank"]

# href="..." / href='...' — scheme filtering happens after extraction
_HREF_RE = r"""(?i)href\s*=\s*["']([^"'#\s>]+)"""


def extract_outlinks(pages: DataFrame, url_col: str = "url",
                     markup_col: str = "html") -> DataFrame:
    """(url, outlink) pairs: absolute http(s) hrefs plus protocol-relative
    hrefs resolved with the page's scheme. Map-only (explode over a native
    regexp scan); binary markup is read as UTF-8 with replacement."""
    raw = F.col(markup_col)
    markup = raw.cast("string")
    hrefs = F.regexp_extract_all(F.coalesce(markup, F.lit("")), F.lit(_HREF_RE), 1)
    scheme = F.coalesce(
        F.lower(F.try_parse_url(F.col(url_col), F.lit("PROTOCOL"))), F.lit("http"))
    resolved = F.transform(
        hrefs,
        lambda h: F.when(h.rlike(r"(?i)^https?://"), h)
                   .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
                   .otherwise(F.lit(None)),
    )
    # two-step select: referencing url_col inside the link expression AND
    # re-aliasing it to "url" in one projection trips Spark 4's
    # lateral-column-alias resolution when url_col == "url"
    staged = pages.withColumn("_outlinks", F.filter(resolved, lambda x: x.isNotNull()))
    return staged.select(
        F.col(url_col).alias("url"),
        F.explode("_outlinks").alias("outlink"),
    )


def host_graph(links: DataFrame, src_col: str = "url",
               dst_col: str = "outlink") -> DataFrame:
    """(src_host, dst_host, n_links) with self-edges dropped — one
    partial-aggregated shuffle."""
    e = links.select(
        url_host(F.col(src_col)).alias("src_host"),
        url_host(F.col(dst_col)).alias("dst_host"),
    ).where(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull()
            & (F.col("src_host") != F.col("dst_host")))
    return e.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_links"))


def pagerank(edges: DataFrame, src_col: str = "src_host",
             dst_col: str = "dst_host", iters: int = 10,
             damping: float = 0.85, checkpoint_every: int = 5) -> DataFrame:
    """(node, rank) after ``iters`` damped power iterations.

    Uniform initialization; per-iteration: rank mass flows along
    out-edges in equal shares (edge multiplicities from ``host_graph``
    are NOT weights — the published algorithm is structural), dangling
    mass redistributes uniformly, then
    ``rank = (1-d)/N + d * (inflow + dangling/N)``. sum(rank) stays 1.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")) \
        .distinct()
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))).distinct().localCheckpoint()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # static per-node frame: degree riding along saves a join per iteration
    base = nodes.join(out_deg, nodes["node"] == out_deg["src"], "left") \
        .select("node", F.coalesce("deg", F.lit(0)).alias("deg")) \
        .localCheckpoint()
    ranks = base.withColumn("rank", F.lit(1.0 / n))
    for it in range(iters):
        dangling = ranks.where(F.col("deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        contrib = (
            e.join(ranks.select(
                       F.col("node").alias("src"),
                       # dangling nodes never match an edge, but ANSI mode
                       # evaluates the projection before the join filters
                       F.when(F.col("deg") > 0,
                              F.col("rank") / F.col("deg")).alias("share")),
                   "src")
            .groupBy("dst").agg(F.sum("share").alias("inflow"))
        )
        ranks = (
            base.join(contrib, base["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node", "deg",
                (F.lit((1.0 - damping) / n)
                 + F.lit(damping) * (F.coalesce("inflow", F.lit(0.0))
                                     + F.col("_dm") / n)).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.round("rank", 12).alias("rank"))
