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


def test_url_host_and_host_stats(spark):
    from pdfextractor_spark.ops.urls import host_stats, url_host

    df = spark.createDataFrame([
        ("https://WWW.Example.com/a", 100),
        ("http://example.com:80/b?utm_source=x", 50),
        ("https://other.org/", 10),
        ("not a url", 1),
    ], "url string, n_bytes long")
    hosts = [r["h"] for r in df.select(url_host("url").alias("h")).collect()]
    assert hosts == ["example.com", "example.com", "other.org", None]

    out = {r["host"]: r for r in
           host_stats(df, size_col="n_bytes").collect()}
    assert out["example.com"]["n_docs"] == 2
    assert out["example.com"]["total_bytes"] == 150
    # /a and /b are different canonical urls
    assert out["example.com"]["approx_canonical_urls"] == 2
    assert out["other.org"]["n_docs"] == 1 and None in out


def test_cap_per_host_matches_single_window(spark):
    """Two-phase salted cap == the naive global top-N per host, on a
    corpus with one mega-host; deterministic and all-native."""
    from pdfextractor_spark.ops.urls import cap_per_host

    rows = [(f"https://mega.com/p{i:03d}", float(i % 17)) for i in range(120)]
    rows += [(f"https://tiny{j}.org/x", 1.0) for j in range(5)]
    df = spark.createDataFrame(rows, "url string, score double")

    capped = cap_per_host(df, max_docs=7, order_col="score", salts=8)
    got = sorted((r["url"], r["score"]) for r in capped.collect())

    # naive expectation in plain Python: top-7 by (score desc, url asc)
    mega = sorted((r for r in rows if "mega" in r[0]),
                  key=lambda r: (-r[1], r[0]))[:7]
    tiny = [r for r in rows if "tiny" in r[0]]
    assert got == sorted(mega + tiny)

    # second run identical (deterministic ordering incl. ties)
    again = sorted((r["url"], r["score"])
                   for r in cap_per_host(df, max_docs=7, order_col="score",
                                         salts=8).collect())
    assert again == got

    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_registrable_domain_psl_semantics(spark):
    from pdfextractor_spark.ops.urls import psl_rules, registrable_domain

    rules = psl_rules(spark, [
        "// mini public-suffix list for the test",
        "com", "uk", "co.uk", "jp", "ck", "*.ck", "!www.ck", "github.io",
    ])
    hosts = [
        ("a.b.com", "b.com"),            # longest normal rule: com
        ("x.co.uk", "x.co.uk"),          # co.uk beats uk
        ("deep.x.co.uk", "x.co.uk"),
        ("foo.bar.ck", "foo.bar.ck"),    # *.ck -> bar.ck is the suffix
        ("bar.ck", None),                # host IS a wildcard public suffix
        ("www.ck", "www.ck"),            # exception un-suffixes www.ck
        ("sub.www.ck", "www.ck"),
        ("user.github.io", "user.github.io"),  # private-domain rule
        ("pages.user.github.io", "user.github.io"),
        ("foo.xyzzy", "foo.xyzzy"),      # unknown TLD -> default rule
        ("com", None),                   # bare public suffix
        ("192.168.10.1", "192.168.10.1"),  # IP folds to itself
        ("localhost", None),             # single label, nothing to fold
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], "host string")
    got = {r["host"]: r["etld1"]
           for r in registrable_domain(df, rules).collect()}
    for h, want in hosts:
        assert got[h] == want, (h, got[h], want)
    # rule side stays broadcast
    plan = registrable_domain(df, rules) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def _hint(spark, url, hint):
    from pdfextractor_spark.ops.urls import resolve_canonical_hint

    df = spark.createDataFrame([(url, hint)], "url string, hint string")
    return df.select(
        resolve_canonical_hint("url", "hint").alias("c")).collect()[0]["c"]


def test_resolve_canonical_hint_forms(spark):
    page = "https://www.ex.org/blog/post?page=2"
    # absolute / protocol-relative / root-relative / query-only / relative
    assert _hint(spark, page, "https://ex.org/blog/post") == "https://ex.org/blog/post"
    assert _hint(spark, page, "//ex.org/blog/post") == "https://ex.org/blog/post"
    assert _hint(spark, page, "/blog/post") == "https://ex.org/blog/post"
    assert _hint(spark, page, "?page=1") == "https://ex.org/blog/post?page=1"
    assert _hint(spark, page, "post") == "https://ex.org/blog/post"
    # dot segments resolve against the page directory
    assert _hint(spark, page, "../blog/./post") == "https://ex.org/blog/post"
    # the target itself is canonicalized (tracking params, www, port)
    assert _hint(spark, page, "http://www.ex.org:80/a?utm_source=x") \
        == "http://ex.org/a"


def test_resolve_canonical_hint_rejects(spark):
    page = "https://ex.org/a"
    assert _hint(spark, page, None) is None
    assert _hint(spark, page, "") is None
    assert _hint(spark, page, "#frag") is None
    # cross-host canonical = the SEO-spam vector; never folded
    assert _hint(spark, page, "https://evil.example/a") is None
    # subdomain is a different host too
    assert _hint(spark, page, "https://m.ex.org/a") is None
    # but www.<host> folds with strip_www (same registrable spelling)
    assert _hint(spark, page, "https://www.ex.org/a") == "https://ex.org/a"


def test_url_dedup_with_canonical_hint(spark):
    from pdfextractor_spark.ops.urls import url_dedup

    rows = [
        # three spellings the site declares as one document
        ("https://ex.org/post?page=1", "2024-01-01 00:00:00", "/post", "p1"),
        ("https://ex.org/post?page=2", "2024-06-01 00:00:00", "/post", "p2"),
        ("https://ex.org/post",        "2024-03-01 00:00:00", None,    "main"),
        # a cross-host hint must NOT fold into another site
        ("https://other.net/post",     "2024-01-01 00:00:00",
         "https://ex.org/post", "other"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, canonical_hint string, text string") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = url_dedup(pages, hint_col="canonical_hint").collect()
    by = {r["canonical_url"]: r["text"] for r in out}
    assert by == {"https://ex.org/post": "p2",       # latest of the folded 3
                  "https://other.net/post": "other"}

    # the hint fold stays map-only: still exactly one shuffle, no Python
    plan = url_dedup(pages, hint_col="canonical_hint") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_prepare_corpus_folds_canonical_hint(spark):
    from pdfextractor_spark.pipeline.webclean import prepare_training_corpus

    body = ("First sentence of the body. Second sentence follows here. "
            "Third sentence is also real. Fourth one keeps it going. "
            "Fifth sentence closes it out.")
    rows = [
        ("https://ex.org/post?page=1", "2024-01-01 00:00:00", "/post", body),
        ("https://ex.org/post",        "2024-03-01 00:00:00", None, body),
        ("https://ex.org/other",       "2024-01-01 00:00:00", None,
         body.replace("body", "other page")),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, canonical_hint string, text string") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = prepare_training_corpus(
        pages, extract=False, canonical_hint_col="canonical_hint",
        dup_line_min_count=None).select("url").collect()
    urls = sorted(r["url"] for r in out)
    assert urls == ["https://ex.org/other", "https://ex.org/post"]


def test_url_quality_flags_and_plan(spark):
    """FineWeb-style URL gates: each pathological class trips exactly its
    flag; the op is one map-only projection (no Exchange, no Python)."""
    from pdfextractor_spark.ops.urls import with_url_quality

    df = spark.createDataFrame([
        (1, "https://example.com/article/clean-page"),
        (2, "https://777-888-999.bet1234567890.example/x"),
        (3, "https://cheap-deals-best-buy-now-today.example/p"),
        (4, "https://ok.example/a/b/c/d/e/f/g/h/i/j/k"),
        (5, "https://ok.example/s?" + "&".join(f"p{i}=1" for i in range(11))),
        (6, "https://xxxcasino.example/page"),
        (7, None),
        (8, "https://ok.example/" + "x" * 300),
    ], "doc_id long, url string")
    out = {r["doc_id"]: r for r in with_url_quality(df).collect()}
    assert out[1]["url_quality_ok"] is True
    assert out[2]["host_digit_frac"] > 0.4 and not out[2]["url_quality_ok"]
    assert out[3]["host_hyphens"] >= 5 and not out[3]["url_quality_ok"]
    assert out[4]["path_depth"] == 11 and not out[4]["url_quality_ok"]
    assert out[5]["n_query_params"] == 11 and not out[5]["url_quality_ok"]
    assert out[6]["url_spam_token"] and not out[6]["url_quality_ok"]
    assert out[7]["url_quality_ok"] is False  # null url fails, not null
    assert out[8]["url_len"] > 200 and not out[8]["url_quality_ok"]
    # tunable thresholds flip the verdicts
    relaxed = {r["doc_id"]: r["url_quality_ok"] for r in with_url_quality(
        df, max_depth=20, max_params=20).collect()}
    assert relaxed[4] is True and relaxed[5] is True
    plan = with_url_quality(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
