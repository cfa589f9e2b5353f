"""robots.txt filtering (ops/robots.py): RFC 9309 group selection,
longest-match Allow/Disallow, wildcard/anchor patterns, defaults."""

from pdfextractor_spark.ops.robots import parse_robots, robots_filter

_ROBOTS_A = """\
# comments are stripped
User-agent: otherbot
Disallow: /

User-agent: trainingbot
User-agent: extrabot
Disallow: /private/
Allow: /private/ok/
Disallow: /*.pdf$
Disallow: /tmp*
Disallow:

User-agent: *
Disallow: /everything/
"""

_ROBOTS_STAR_ONLY = """\
User-agent: *
Disallow: /blocked/
Allow: /blocked/but-fine
"""


def _robots(spark):
    return spark.createDataFrame(
        [("a.com", _ROBOTS_A), ("b.org", _ROBOTS_STAR_ONLY), ("c.net", "")],
        "host string, robots_txt string",
    )


def test_parse_robots_group_selection(spark):
    rules = {(r["host"], r["pattern"]): r["allow"]
             for r in parse_robots(_robots(spark), "trainingbot").collect()}
    # exact-agent group wins over *; shared UA lines join one group;
    # empty Disallow is a no-op
    assert rules == {
        ("a.com", "/private/"): False,
        ("a.com", "/private/ok/"): True,
        ("a.com", "/*.pdf$"): False,
        ("a.com", "/tmp*"): False,
        ("b.org", "/blocked/"): False,
        ("b.org", "/blocked/but-fine"): True,
    }
    # an agent with no exact group falls back to *
    star = {(r["host"], r["pattern"]) for r in
            parse_robots(_robots(spark), "strangerbot").collect()}
    assert ("a.com", "/everything/") in star
    assert ("a.com", "/private/") not in star


def test_robots_filter_longest_match_semantics(spark):
    cases = [
        ("https://a.com/public/page", True),          # no rule matches
        ("https://a.com/private/doc", False),         # Disallow /private/
        ("https://a.com/private/ok/doc", True),       # longer Allow wins
        ("https://a.com/files/paper.pdf", False),     # /*.pdf$ anchored
        ("https://a.com/files/paper.pdf.html", True), # $ anchor blocks only exact
        ("https://a.com/tmpfile", False),             # /tmp* prefix wildcard
        ("https://a.com/", True),
        ("https://b.org/blocked/page", False),
        ("https://b.org/blocked/but-fine/page", True),
        ("https://c.net/anything", True),             # empty robots file
        ("https://nohost.io/x", True),                # no robots row at all
    ]
    pages = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r["url"]: r["robots_allowed"]
           for r in robots_filter(pages, _robots(spark), "trainingbot").collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


def test_robots_filter_deterministic_and_keeps_rows(spark):
    pages = spark.createDataFrame(
        [(f"https://a.com/p{i}",) for i in range(20)], "url string")
    out = robots_filter(pages, _robots(spark), "trainingbot")
    assert out.count() == 20  # flag, not a row filter
    a = sorted((r["url"], r["robots_allowed"]) for r in out.collect())
    b = sorted((r["url"], r["robots_allowed"]) for r in
               robots_filter(pages, _robots(spark), "trainingbot").collect())
    assert a == b


def test_robots_rules_match_query_string(spark):
    robots = spark.createDataFrame(
        [("q.com", "User-agent: *\nDisallow: /*?\nAllow: /search?safe=1\n")],
        "host string, robots_txt string",
    )
    cases = [
        ("https://q.com/page", True),              # no query
        ("https://q.com/page?x=1", False),         # /*? blocks any query
        ("https://q.com/search?safe=1", True),     # longer Allow wins
        ("https://q.com/search?safe=0", False),
    ]
    pages = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r["url"]: r["robots_allowed"]
           for r in robots_filter(pages, robots, "anybot").collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


def test_blank_line_between_ua_lines_keeps_group(spark):
    # RFC 9309 ABNF allows emptyline between startgrouplines: a blank (or
    # comment-only) line between two User-agent lines must NOT split the
    # group — earlier agents would otherwise get zero rules and the gate
    # would fail open.
    txt = (
        "User-agent: trainingbot\n"
        "\n"
        "# comment only\n"
        "User-agent: helperbot\n"
        "Disallow: /x/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /star/\n"
    )
    robots = spark.createDataFrame([("g.com", txt)],
                                   "host string, robots_txt string")
    for agent in ("trainingbot", "helperbot"):
        rules = {(r["pattern"], r["allow"])
                 for r in parse_robots(robots, agent).collect()}
        assert rules == {("/x/", False)}, (agent, rules)
    # a rule line DOES close the UA run: the next UA starts a new group
    txt2 = (
        "User-agent: trainingbot\n"
        "Disallow: /a/\n"
        "User-agent: helperbot\n"
        "Disallow: /b/\n"
    )
    robots2 = spark.createDataFrame([("g.com", txt2)],
                                    "host string, robots_txt string")
    rules2 = {r["pattern"] for r in parse_robots(robots2, "trainingbot").collect()}
    assert rules2 == {"/a/"}


def test_robots_filter_never_shuffles_pages_on_url(spark):
    # the politeness gate runs over EVERY page before extraction: the page
    # table must see at most the host join — never a url-keyed Exchange
    # (the old explode -> groupBy(url) -> join-back shape paid two)
    pages = spark.createDataFrame(
        [(f"https://a.com/p{i}",) for i in range(50)], "url string")
    out = robots_filter(pages, _robots(spark), "trainingbot")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(url" not in plan
    assert "hashpartitioning(_u" not in plan
    # allowed: the robots-side rule fold + (at most) a host-keyed join
    assert plan.count("Exchange hashpartitioning") <= 2


def test_robots_host_meta_crawl_delay_and_sitemaps(spark):
    """Crawl-delay follows the winning UA group (exact beats *, first
    value wins, junk -> null); Sitemap URLs are group-independent."""
    from pdfextractor_spark.ops.robots import parse_robots, robots_host_meta

    txt_a = ("User-agent: *\nCrawl-delay: 10\nDisallow: /tmp/\n\n"
             "User-agent: trainingbot\nCrawl-delay: 2.5\nDisallow: /private/\n"
             "Sitemap: https://a.example/sitemap.xml\n"
             "Sitemap: https://a.example/news.xml\n")
    txt_b = "User-agent: *\nCrawl-delay: soon\nDisallow: /x/\n"
    txt_c = "User-agent: *\nDisallow: /y/\n"
    robots = spark.createDataFrame(
        [("a.example", txt_a), ("b.example", txt_b), ("c.example", txt_c)],
        "host string, robots_txt string")

    meta = {r["host"]: r for r in
            robots_host_meta(robots, agent="trainingbot").collect()}
    assert meta["a.example"]["crawl_delay"] == 2.5  # exact group beats *
    assert meta["a.example"]["sitemaps"] == [
        "https://a.example/sitemap.xml", "https://a.example/news.xml"]
    assert meta["b.example"]["crawl_delay"] is None  # non-numeric
    assert meta["c.example"]["crawl_delay"] is None  # absent
    assert meta["b.example"]["sitemaps"] == []
    # trailing #-comments are stripped like every other directive
    commented = ("User-agent: *\nDisallow: /x/\n"
                 "Sitemap: https://d.example/s.xml # primary index\n")
    dmeta = robots_host_meta(
        spark.createDataFrame([("d.example", commented)],
                              "host string, robots_txt string")).first()
    assert dmeta["sitemaps"] == ["https://d.example/s.xml"]

    # the crawl-delay pseudo-rules never leak into the verdict rules
    rules = parse_robots(robots, agent="trainingbot").collect()
    assert all(r["allow"] in (True, False) for r in rules)
    assert all(not r["pattern"].replace(".", "").isdigit() for r in rules)
    # map-only: no shuffle, no python
    plan = robots_host_meta(robots)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_hostile_robots_input_is_bounded(spark):
    """RFC 9309 §2.4 parse limit: a multi-MB hostile robots.txt must not
    become a multi-MB per-host rule array. Rules parse only from the
    first 500 KiB (cut at the last complete line), and verdicts on the
    longest-match cases are unchanged when the hostile payload is
    appended AFTER the real policy."""
    from pdfextractor_spark.ops.robots import ROBOTS_MAX_CHARS

    # ~3 MB of junk Disallow lines appended after the real policy, inside
    # a second trainingbot group (RFC 9309 merges same-UA groups, so the
    # junk lands in the WINNING group — the worst case for the bound)
    junk = "".join(f"Disallow: /junk-{'x' * 90}-{i:07d}/\n"
                   for i in range(28_000))
    assert len(junk) > 5 * ROBOTS_MAX_CHARS
    hostile = _ROBOTS_A + "\nUser-agent: trainingbot\n" + junk
    robots = spark.createDataFrame(
        [("a.com", hostile), ("b.org", _ROBOTS_STAR_ONLY), ("c.net", "")],
        "host string, robots_txt string")

    rules = parse_robots(robots, "trainingbot").collect()
    # bounded: only rules from inside the limit survive (the real policy
    # plus however much junk fits under 500 KiB — ~4.7k of the 28k sent,
    # which also stays under robots_filter's 5000-rule cap so the real
    # short rules below cannot be evicted by longest-first retention)
    n_junk_kept = sum(1 for r in rules if r["pattern"].startswith("/junk-"))
    assert 0 < n_junk_kept < 5_000
    # every kept junk rule parsed from a COMPLETE line (the mid-line cut
    # can't rewrite a directive): patterns all end with "/"
    assert all(r["pattern"].endswith("/") for r in rules
               if r["pattern"].startswith("/junk-"))

    # the 11 RFC longest-match verdicts are unchanged under the attack
    cases = [
        ("https://a.com/public/page", True),
        ("https://a.com/private/doc", False),
        ("https://a.com/private/ok/doc", True),
        ("https://a.com/files/paper.pdf", False),
        ("https://a.com/files/paper.pdf.html", True),
        ("https://a.com/tmpfile", False),
        ("https://a.com/", True),
        ("https://b.org/blocked/page", False),
        ("https://b.org/blocked/but-fine/page", True),
        ("https://c.net/anything", True),
        ("https://nohost.io/x", True),
    ]
    pages = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r["url"]: r["robots_allowed"]
           for r in robots_filter(pages, robots, "trainingbot").collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


def test_robots_truncation_drops_split_final_line(spark):
    """A directive split by the 500 KiB cut must vanish entirely, not
    parse as a shorter (different) pattern."""
    from pdfextractor_spark.ops.robots import ROBOTS_MAX_CHARS

    head = "User-agent: *\n"
    pad = "#" + "x" * (ROBOTS_MAX_CHARS - len(head) - 12) + "\n"
    # the final directive starts inside the limit but ends beyond it
    txt = head + pad + "Disallow: /admin-secret/\n"
    assert len(head + pad) < ROBOTS_MAX_CHARS < len(txt)
    robots = spark.createDataFrame([("t.com", txt)],
                                   "host string, robots_txt string")
    rules = parse_robots(robots, "anybot").collect()
    pats = [r["pattern"] for r in rules]
    assert pats == []  # neither "/admin-secret/" nor a mangled prefix


def test_robots_filter_rule_cap_longest_first(spark):
    """max_rules_per_host keeps the longest patterns (the ones that can
    win a longest-match decision) deterministically."""
    body = "User-agent: *\n" + "".join(
        f"Disallow: /{'d' * (i + 1)}/\n" for i in range(20)) \
        + "Allow: /" + "d" * 20 + "/ok/\n"
    robots = spark.createDataFrame([("cap.com", body)],
                                   "host string, robots_txt string")
    urls = [
        ("https://cap.com/" + "d" * 20 + "/x", False),   # longest Disallow kept
        ("https://cap.com/" + "d" * 20 + "/ok/x", True),  # longest Allow kept
        ("https://cap.com/d/x", True),  # short rule fell out of the cap
    ]
    pages = spark.createDataFrame([(u,) for u, _ in urls], "url string")
    got = {r["url"]: r["robots_allowed"] for r in robots_filter(
        pages, robots, "anybot", max_rules_per_host=5).collect()}
    for u, want in urls:
        assert got[u] == want, (u, got[u], want)
    # uncapped: the short rule still applies
    full = {r["url"]: r["robots_allowed"] for r in robots_filter(
        pages, robots, "anybot", max_rules_per_host=None).collect()}
    assert full["https://cap.com/d/x"] is False
