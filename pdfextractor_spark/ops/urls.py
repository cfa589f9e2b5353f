"""URL canonicalization + canonical-URL dedup (web-pipeline operator).

A Common-Crawl-style pages table carries the same document under many
url spellings — scheme/host case, default ports, duplicate slashes,
trailing slashes, tracking query params, param order, fragments. Before
any content-level dedup (exact/MinHash — ``ops/dedup.py``), a crawl
pipeline collapses those spellings; this module does it with NATIVE
expressions only (``try_parse_url`` + higher-order functions — zero Python
in the plan), so canonicalization is a map-only stage and the dedup
itself is the standard one-shuffle latest-wins window.

Normalizations applied (the conservative, semantics-preserving set from
RFC 3986 §6 plus the crawl-standard tracking-param strip):

- scheme and authority lowercased; userinfo dropped
- default ports stripped (``:80`` for http, ``:443`` for https)
- optional ``www.`` prefix strip (on by default — crawl dedup treats
  ``www.example.com`` and ``example.com`` as one site; disable for
  host-exact work)
- path: duplicate slashes collapsed, trailing slash stripped (root
  stays ``/``)
- query: tracking params dropped (``utm_*``, ``gclid``, ``fbclid``,
  ``msclkid``), remaining params byte-sorted; empty query dropped
- fragment dropped

Percent-decoding is deliberately NOT applied (decoding can change
semantics for reserved characters); neither is IDN/punycode folding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonicalize_url", "url_dedup", "url_dup_stats"]

_TRACKING_RE = "^(utm_[a-z0-9]+|gclid|fbclid|msclkid)="


def canonicalize_url(url, strip_www: bool = True) -> Column:
    """Canonical form of ``url`` as a native expression column."""
    u = F.trim(url if isinstance(url, Column) else F.col(url))
    proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    # AUTHORITY = [userinfo@]host[:port]; drop userinfo, lowercase,
    # strip the scheme's default port
    auth = F.lower(F.regexp_replace(
        F.try_parse_url(u, F.lit("AUTHORITY")), r"^[^@/]*@", ""))
    auth = F.when(proto == "http", F.regexp_replace(auth, ":80$", "")) \
        .when(proto == "https", F.regexp_replace(auth, ":443$", "")) \
        .otherwise(auth)
    if strip_www:
        auth = F.regexp_replace(auth, r"^www\.", "")
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.when(path == "", F.lit("/")) \
        .otherwise(F.regexp_replace(path, "(?<=.)/$", ""))
    query = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
    kept = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE)))
    qstr = F.array_join(kept, "&")
    return F.when(
        proto.isNull() | (F.try_parse_url(u, F.lit("HOST")).isNull()), u,
    ).otherwise(F.concat(
        proto, F.lit("://"), auth, path,
        F.when(qstr == "", F.lit("")).otherwise(F.concat(F.lit("?"), qstr)),
    ))


def url_dedup(pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts",
              strip_www: bool = True) -> DataFrame:
    """Latest-wins dedup on the canonical URL: one row per canonical url
    (most recent ``ts_col``; ties broken by the raw url string for
    determinism). Map-only canonicalization + ONE shuffle on the
    canonical key — the same W4 latest-per-key shape as the NDJSON
    dedupe, so it scales identically."""
    from pyspark.sql import Window

    canon = pages.withColumn(
        "canonical_url", canonicalize_url(url_col, strip_www=strip_www))
    w = Window.partitionBy("canonical_url").orderBy(
        F.col(ts_col).desc(), F.col(url_col).desc())
    return (canon
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn"))


def url_dup_stats(pages: DataFrame, url_col: str = "url",
                  strip_www: bool = True) -> DataFrame:
    """(canonical_url, n_variants, n_rows) for canonical urls with more
    than one raw spelling — the crawl-dedup audit table."""
    canon = pages.withColumn(
        "canonical_url", canonicalize_url(url_col, strip_www=strip_www))
    return (canon.groupBy("canonical_url")
            .agg(F.countDistinct(url_col).alias("n_variants"),
                 F.count(F.lit(1)).alias("n_rows"))
            .where(F.col("n_variants") > 1))
