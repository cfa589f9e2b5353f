"""URL canonicalization + canonical dedup (ops/urls.py)."""

import pyspark.sql.functions as F


def _canon(spark, urls, **kw):
    from pdfextractor_spark.ops.urls import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in
            df.select(canonicalize_url("url", **kw).alias("c")).collect()]


def test_canonicalize_collapses_equivalent_spellings(spark):
    variants = [
        "http://WWW.Example.com:80//a/b/?utm_source=x&b=2&a=1#frag",
        "http://example.com/a/b?a=1&b=2",
        "HTTP://example.com:80/a//b/?b=2&a=1&utm_campaign=y",
        "http://user:pw@www.example.com/a/b?fbclid=zzz&a=1&b=2",
    ]
    out = set(_canon(spark, variants))
    assert out == {"http://example.com/a/b?a=1&b=2"}


def test_canonicalize_preserves_distinctions(spark):
    urls = [
        "https://example.com/a",       # scheme differs from http
        "http://example.com/a",
        "http://example.com/a?q=1",    # real param kept
        "http://example.com/A",        # path case is significant
        "http://example.com:8080/a",   # non-default port kept
        "http://sub.example.com/a",    # subdomain (non-www) kept
        "http://example.com/a%2Fb",    # percent-encoding untouched
    ]
    out = _canon(spark, urls)
    assert len(set(out)) == len(urls)
    assert out[4] == "http://example.com:8080/a"
    assert out[6] == "http://example.com/a%2Fb"


def test_canonicalize_edges(spark):
    out = _canon(spark, [
        "http://example.com",            # empty path -> /
        "http://example.com/?utm_source=only",  # query empties away
        "https://Example.COM:443/",
        "not a url at all",              # unparseable: passes through
    ])
    assert out[0] == "http://example.com/"
    assert out[1] == "http://example.com/"
    assert out[2] == "https://example.com/"
    assert out[3] == "not a url at all"
    # host-exact mode keeps www distinct
    keep = _canon(spark, ["http://www.example.com/x", "http://example.com/x"],
                  strip_www=False)
    assert keep[0] != keep[1]


def test_url_dedup_latest_wins_and_plan(spark):
    from pdfextractor_spark.ops.urls import url_dedup, url_dup_stats

    rows = [
        ("http://www.a.com/p?utm_source=t", "2024-01-01 00:00:00", "old"),
        ("http://a.com/p", "2024-06-01 00:00:00", "new"),
        ("http://a.com/q", "2024-01-01 00:00:00", "only"),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts string, text string") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = url_dedup(pages).collect()
    by = {r["canonical_url"]: r for r in out}
    assert len(out) == 2
    assert by["http://a.com/p"]["text"] == "new"  # latest spelling won
    assert by["http://a.com/q"]["text"] == "only"

    stats = url_dup_stats(pages).collect()
    assert len(stats) == 1 and stats[0]["n_variants"] == 2

    # plan: map-only canonicalization + exactly one shuffle (the window),
    # and no Python UDF anywhere
    plan = url_dedup(pages)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_canonicalize_idempotent(spark):
    """canon(canon(u)) == canon(u) over a URL soup — the defining property
    of a canonicalizer (a second pass must find nothing left to fix)."""
    import itertools

    from pdfextractor_spark.ops.urls import canonicalize_url

    schemes = ["http", "HTTP", "https", "ftp"]
    hosts = ["Example.com", "www.example.com", "a.b.example.com:8080",
             "user@example.com:80", "example.com:443"]
    paths = ["", "/", "//x//y/", "/x/y", "/%2F/y/", "/x/"]
    queries = ["", "?b=2&a=1", "?utm_source=t&a=1", "?utm_source=only",
               "?a=1&a=0", "?=&a"]
    frags = ["", "#f"]
    urls = ["".join(p) for p in itertools.product(
        (s + "://" for s in schemes), hosts, paths, queries, frags)]
    urls += ["", "not a url", "http://", "//proto-relative/x", ":::", "a b c"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = (df.withColumn("c1", canonicalize_url("url"))
             .withColumn("c2", canonicalize_url(F.col("c1")))
             .where(~F.col("c1").eqNullSafe(F.col("c2")))
             .collect())
    assert out == [], [(r["url"], r["c1"], r["c2"]) for r in out[:5]]
