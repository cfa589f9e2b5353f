"""URL canonicalization, canonical-URL dedup, and per-host rollup/caps
(web-pipeline operators).

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

__all__ = ["canonicalize_url", "resolve_canonical_hint", "url_dedup",
           "url_dup_stats", "url_host", "host_stats", "cap_per_host",
           "psl_rules", "registrable_domain", "with_url_quality"]

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


def resolve_canonical_hint(url, hint, strip_www: bool = True) -> Column:
    """The page-declared ``<link rel=canonical>`` href resolved to an
    absolute canonical URL, or NULL when the hint is absent, unusable,
    or points at a DIFFERENT host.

    The spelling-level canonicalizer above can only fold variants of the
    same address (case, ports, tracking params); the rel=canonical hint
    is the site's OWN statement that distinct addresses serve one
    document (``/post?page=2`` -> ``/post``, mobile mirrors, print
    views), so folding on it removes duplication no syntactic rule can
    see. Resolution follows RFC 3986 §5 for the forms that occur in head
    links — absolute, protocol-relative, root-relative, query-only, and
    path-relative against the page's directory, with ``.``/``..``
    dot-segment removal (``..`` chains deeper than 4 pass through; they
    do not occur in real canonical links). Cross-host hints return NULL:
    an unverified cross-site canonical is the classic SEO-spam vector,
    and a crawl pipeline must not let one host claim another's pages.
    All of it is native expressions — the hint fold adds zero Python and
    zero shuffles to the dedup stage."""
    u = F.trim(url if isinstance(url, Column) else F.col(url))
    h = F.trim(hint if isinstance(hint, Column) else F.col(hint))
    proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    base = F.concat(proto, F.lit("://"), F.try_parse_url(u, F.lit("AUTHORITY")))
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("/"))
    page_dir = F.regexp_replace(path, "[^/]*$", "")
    absu = (
        F.when(h.isNull() | (h == "") | h.startswith("#"), F.lit(None))
        .when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), h)
        .when(h.startswith("//"), F.concat(proto, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(base, h))
        .when(h.startswith("?"), F.concat(base, path, h))
        .otherwise(F.concat(base, page_dir, h)))
    absu = F.regexp_replace(absu, r"/\./", "/")
    for _ in range(4):  # "seg/../" collapse; lookahead skips a ".." segment
        absu = F.regexp_replace(absu, r"/(?!\.\./)[^/]+/\.\./", "/")
    canon = canonicalize_url(absu, strip_www=strip_www)
    return F.when(
        url_host(canon, strip_www) == url_host(u, strip_www), canon)


def url_dedup(pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts",
              strip_www: bool = True, hint_col: str | None = None) -> DataFrame:
    """Latest-wins dedup on the canonical URL: one row per canonical url
    (most recent ``ts_col``; ties broken by the raw url string for
    determinism). Map-only canonicalization + ONE shuffle on the
    canonical key — the same W4 latest-per-key shape as the NDJSON
    dedupe, so it scales identically.

    ``hint_col`` (optional) names a page-declared rel=canonical column
    (``ops/pagemeta.py`` extracts one): rows whose hint resolves
    same-host (``resolve_canonical_hint``) fold under the DECLARED
    target instead of their own spelling — still map-only, same single
    shuffle."""
    from pyspark.sql import Window

    key = canonicalize_url(url_col, strip_www=strip_www)
    if hint_col is not None:
        key = F.coalesce(
            resolve_canonical_hint(url_col, hint_col, strip_www=strip_www),
            key)
    canon = pages.withColumn("canonical_url", key)
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


def url_host(url, strip_www: bool = True) -> Column:
    """Lowercased host of ``url`` as a native expression (null when the
    string does not parse as a URL). Registrable-domain (eTLD+1) folding
    needs the public-suffix list — at scale that is a broadcast join
    against a suffix table, not an expression — so this stays at host
    granularity, the unit FineWeb-style per-site caps actually use."""
    u = F.trim(url if isinstance(url, Column) else F.col(url))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "") if strip_www else host


def host_stats(pages: DataFrame, url_col: str = "url",
               size_col: str | None = None) -> DataFrame:
    """Per-host crawl rollup: document count, distinct canonical urls,
    and total payload bytes when ``size_col`` is given. ONE shuffle with
    map-side partial aggregation — the audit table a crawl pipeline
    reads before choosing per-host caps."""
    df = pages.withColumn("host", url_host(url_col)) \
        .withColumn("_canon", canonicalize_url(url_col))
    aggs = [F.count(F.lit(1)).alias("n_docs"),
            F.approx_count_distinct("_canon").alias("approx_canonical_urls")]
    if size_col is not None:
        aggs.append(F.sum(size_col).cast("long").alias("total_bytes"))
    return df.groupBy("host").agg(*aggs)


def cap_per_host(pages: DataFrame, max_docs: int, url_col: str = "url",
                 order_col: str | None = None, salts: int = 64) -> DataFrame:
    """Keep at most ``max_docs`` documents per host — the FineWeb-style
    per-site cap that stops mega-hosts from dominating a training mix.
    Rows are ranked by ``order_col`` descending (a quality score; ties
    and the default fall back to the url string for determinism).

    A single ``row_number() OVER (PARTITION BY host)`` puts every row of
    a mega-host (e.g. a blogging platform with 10^9 pages) into ONE
    task, so this runs two phases instead: a salted local top-``max_docs``
    per ``(host, salt)`` first, which bounds the final per-host window to
    ``max_docs * salts`` rows regardless of host size, then the exact
    global top-``max_docs`` per host over that residue. Both phases are
    native window plans; total extra cost is one narrow shuffle of the
    already-capped residue.
    """
    from pyspark.sql import Window

    order = [F.col(order_col).desc()] if order_col else []
    order = order + [F.col(url_col)]
    df = pages.withColumn("_host", url_host(url_col)) \
        .withColumn("_salt", F.pmod(F.xxhash64(url_col), F.lit(salts)))
    w_local = Window.partitionBy("_host", "_salt").orderBy(*order)
    local = (df.withColumn("_rn", F.row_number().over(w_local))
             .where(F.col("_rn") <= max_docs).drop("_rn"))
    w_host = Window.partitionBy("_host").orderBy(*order)
    return (local.withColumn("_rn", F.row_number().over(w_host))
            .where(F.col("_rn") <= max_docs)
            .drop("_rn", "_salt", "_host"))


def psl_rules(spark, lines: list[str]) -> DataFrame:
    """Parse public-suffix-list rule lines into the (name, kind, len)
    table ``registrable_domain`` joins against. ``kind``: ``n`` plain
    suffix, ``w`` wildcard base (``*.ck`` stored as ``ck``), ``e``
    exception (``!www.ck`` stored as ``www.ck``). Comment (``//``) and
    blank lines are ignored, so the published PSL file can be fed
    verbatim. The table is a few 10k rows — broadcast by construction."""
    rows = []
    for ln in lines:
        ln = ln.strip()
        if not ln or ln.startswith("//"):
            continue
        if ln.startswith("!"):
            name, kind = ln[1:], "e"
        elif ln.startswith("*."):
            name, kind = ln[2:], "w"
        else:
            name, kind = ln, "n"
        name = name.lower()
        rows.append((name, kind, name.count(".") + 1))
    return spark.createDataFrame(rows, "name string, kind string, len int")


def registrable_domain(df: DataFrame, rules: DataFrame,
                       host_col: str = "host",
                       out_col: str = "etld1") -> DataFrame:
    """Fold hosts to their registrable domain (eTLD+1) under public-
    suffix-list semantics: longest matching rule wins, ``*.foo`` makes
    every direct child of ``foo`` a public suffix, ``!bar.foo``
    un-suffixes that exact name, and the default rule treats an unknown
    TLD as the suffix. A host that IS a public suffix folds to null;
    IP-address hosts fold to themselves.

    Plan shape: each host explodes into its <=~10 label-suffix
    candidates map-side, the rule table joins BROADCAST, and ONE
    aggregation shuffle per host resolves the longest match — so the
    operator costs one narrow shuffle however large the corpus. At
    10^12 docs, run it on the DISTINCT-host table (~10^8 rows) and join
    the mapping back instead of folding every row."""
    h = F.lower(F.col(host_col))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    cands = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            F.array_join(F.slice(labels, n - i + 1, i), ".").alias("cand"),
            i.alias("clen")),
    )
    exploded = df.select(h.alias("_h"), n.alias("_n"),
                         F.explode(cands).alias("_c")) \
        .select("_h", "_n", F.col("_c.cand").alias("_cand"),
                F.col("_c.clen").alias("_clen"))
    m = exploded.join(F.broadcast(rules), exploded["_cand"] == rules["name"],
                      "left")
    agg = m.groupBy("_h", "_n").agg(
        F.max(F.when(F.col("kind") == "n", F.col("_clen"))).alias("_pn"),
        # wildcard: base matched AND the host actually has the extra label
        F.max(F.when((F.col("kind") == "w")
                     & (F.col("_n") > F.col("_clen")),
                     F.col("_clen") + 1)).alias("_pw"),
        F.max(F.when(F.col("kind") == "e", F.col("_clen") - 1)).alias("_pe"),
    )
    ps_len = F.coalesce(
        F.col("_pe"),
        F.greatest(F.coalesce(F.col("_pn"), F.lit(1)),
                   F.coalesce(F.col("_pw"), F.lit(1))),
    )
    lab2 = F.split(F.col("_h"), r"\.")
    etld1 = F.when(F.col("_h").rlike(r"^[0-9.]+$"), F.col("_h")) \
        .when(F.col("_n") > ps_len,
              F.array_join(
                  F.slice(lab2, F.col("_n") - ps_len, ps_len + 1), ".")) \
        .otherwise(F.lit(None))
    mapping = agg.select(F.col("_h").alias(host_col + "_key"),
                         etld1.alias(out_col))
    return df.join(mapping, h == F.col(host_col + "_key"), "left") \
        .drop(host_col + "_key")


# Conservative default list for the URL-token spam gate (the FineWeb/
# RefinedWeb URL filter idea: adult/gambling/pharma spam markers IN THE
# URL are a high-precision page-quality signal long before fetch/parse).
# Deliberately tiny — a production run supplies its own curated list.
_URL_SPAM_TOKENS = ("porn", "xxx", "casino", "viagra", "escort")


def with_url_quality(df: DataFrame, url_col: str = "url",
                     spam_tokens: tuple = _URL_SPAM_TOKENS,
                     max_len: int = 200, max_depth: int = 8,
                     max_params: int = 10, max_host_digit_frac: float = 0.4,
                     max_host_hyphens: int = 4) -> DataFrame:
    """FineWeb/RefinedWeb-style URL quality flags — the cheapest filter a
    crawl pipeline owns, judged before any byte of the page is parsed:

    - ``url_len`` / overlong urls (session-id / tracking-mill pages)
    - ``host_digit_frac`` (spam mills autogenerate numeric hosts)
    - ``host_hyphens`` (keyword-stuffed SEO hosts: a-b-c-d-cheap.example)
    - ``path_depth`` (calendar/faceted-navigation crawl traps)
    - ``n_query_params`` (faceted/search result permutations)
    - ``url_spam_token`` (adult/gambling tokens anywhere in the url)
    - ``url_quality_ok`` — the conjunction, null-safe (a null url fails)

    All native expressions (one projection, zero shuffles, zero Python);
    thresholds follow the published recipes' spirit and are caller-
    tunable. The flags column, not a row filter: corpus accounting wants
    to COUNT what a gate would remove."""
    u = F.coalesce(F.col(url_col), F.lit(""))
    lower = F.lower(u)
    host = F.coalesce(url_host(url_col, strip_www=False), F.lit(""))
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
    host_len = F.length(host)
    digits = host_len - F.length(F.regexp_replace(host, r"[0-9]", ""))
    hyphens = host_len - F.length(F.regexp_replace(host, "-", ""))
    depth = F.when(path == "", 0).otherwise(
        F.length(path) - F.length(F.regexp_replace(path, "/", "")))
    nparams = F.when(query == "", 0).otherwise(
        F.length(query) - F.length(F.regexp_replace(query, "&", "")) + 1)
    spam = F.lit(False)
    for tok in spam_tokens:
        spam = spam | lower.contains(tok)
    out = (df.withColumn("url_len", F.length(u))
           .withColumn("host_digit_frac",
                       F.round(digits / F.greatest(host_len, F.lit(1)), 4))
           .withColumn("host_hyphens", hyphens)
           .withColumn("path_depth", depth)
           .withColumn("n_query_params", nparams)
           .withColumn("url_spam_token", spam))
    ok = ((F.col(url_col).isNotNull())
          & (F.col("url_len") <= max_len)
          & (F.col("host_digit_frac") <= max_host_digit_frac)
          & (F.col("host_hyphens") <= max_host_hyphens)
          & (F.col("path_depth") <= max_depth)
          & (F.col("n_query_params") <= max_params)
          & ~F.col("url_spam_token"))
    return out.withColumn("url_quality_ok", ok)
