"""robots.txt compliance filtering (RFC 9309 / Google robots spec).

Training-corpus pipelines re-filter crawled pages against robots rules —
a page crawled yesterday may be disallowed today, and corpus audits need
a deterministic "would the polite crawler have fetched this" flag.
Expressed Spark-first:

- ``parse_robots``: robots.txt text -> (path pattern, allow) rules for
  one user-agent, with RFC 9309 group semantics: the most specific
  matching ``User-agent`` group wins (exact agent beats ``*``), multiple
  consecutive UA lines share a group, and empty-pattern Disallow lines
  are no-ops. Runs as a native expression chain over ``split`` lines —
  the robots table (one row per host) stays in the plan, never on the
  driver.
- ``robots_filter``: pages joined to their host's rules; each rule
  pattern is translated to a regex NATIVELY (escape, ``*`` -> ``.*``,
  trailing ``$`` anchor) and matched against the url path; the
  longest-matching rule decides, ``allow`` winning ties at equal length
  (the published tie-break). Unmatched paths and hosts with no robots
  row are allowed (the spec's default).

Rule matching folds each host's rules into one ARRAY row and decides
the longest match MAP-SIDE with higher-order functions over the joined
array — one broadcast-or-shuffle join on host, zero shuffles of the
page table on url.

At 100 TB: the robots side is one row per HOST (~10^8), orders of
magnitude under the page table; the only full-table shuffle is the
host join (map-side when AQE broadcasts the folded rules), the rule
fold's groupBy runs on the robots table alone, and the verdict is a
projection.

Reference parity note: the reference repo has no crawl-politeness
surface; this implements the graft brief's webtext capability from the
published spec (RFC 9309).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .urls import url_host

__all__ = ["parse_robots", "robots_filter", "robots_host_meta"]

# RFC 9309 §2.4: "Crawlers SHOULD impose a parsing limit ... MUST be at
# least 500 kibibytes". Enforcing it here bounds the one skew door in the
# politeness gate: without it a hostile or broken multi-MB robots.txt
# (megabytes of Disallow lines) becomes a multi-MB rule array carried
# through the page join and an O(rules) regex scan per page of that host.
# The limit is counted in CHARACTERS (robots files are ASCII-dominant;
# for multi-byte content a char cut keeps slightly MORE than 500 KiB,
# i.e. errs on the side of honoring published rules).
ROBOTS_MAX_CHARS = 500 * 1024


def _truncate_robots(txt: Column, limit: int = ROBOTS_MAX_CHARS) -> Column:
    """First ``limit`` chars of a robots.txt, cut back to the last complete
    line. Content past the parse limit is ignored (RFC 9309 §2.4); the
    possibly-split final line is dropped too, since a mid-line cut could
    silently rewrite a directive ("Disallow: /admin" -> "Disallow: /ad").

    substring_index (linear scan) finds the split tail, NOT a ``[^\\n]*$``
    regex: an end-anchored pattern makes Java's find() retry the
    backtracking ``$`` probe at every position — O(n^2) on the 500 KiB
    strings this function exists to bound (measured: minutes per row)."""
    head = F.substring(txt, 1, limit)
    tail_len = F.length(F.substring_index(head, "\n", -1))
    return F.when(F.length(txt) <= limit, txt) \
        .otherwise(F.substring(head, F.lit(1), F.length(head) - tail_len))


def _tag_groups(txt: Column) -> Column:
    """robots.txt text -> tagged line array
    (array<struct<gid,ua,pattern,allow>>). Kept as its OWN projection
    column by the callers: every downstream use references the attribute
    instead of embedding a copy of this aggregate — a Column is an
    expression TREE, so referencing it from N places would inline the
    whole parse N times (measured: the single-expression shape spent
    ~2 s PER TASK instantiating the quadruplicated tree, 72 s of CPU to
    parse 97 one-line robots files)."""
    lines = F.transform(
        F.split(txt, r"\r?\n"),
        # strip comments + surrounding whitespace. substring_index, not a
        # "#.*$" regexp_replace: lines are already \n-free, so everything
        # from the first '#' goes — and the end-anchored regex is O(n^2)
        # on a hostile 500 KiB comment line (quadratic '$' backtracking)
        lambda l: F.trim(F.substring_index(l, "#", 1)),
    )

    def _directive(l, name):
        return F.when(
            F.lower(l).rlike(f"^{name}\\s*:"),
            F.trim(F.regexp_replace(l, r"(?i)^[a-z-]+\s*:", "")),
        )

    # group id = running count of user-agent lines; a UA line AFTER rules
    # starts a new group, consecutive UA lines share the group that the
    # LAST of them opens (RFC 9309 collapses them into one group — we tag
    # each rule with the id of the nearest preceding UA run and each UA
    # with the id of the run it belongs to)
    tagged = F.aggregate(
        lines,
        F.struct(
            F.lit(0).alias("gid"),
            F.lit(True).alias("prev_ua"),
            F.array().cast(
                "array<struct<gid:int,ua:string,pattern:string,allow:boolean>>"
            ).alias("out"),
        ),
        lambda acc, l: F.struct(
            F.when(F.lower(l).rlike(r"^user-agent\s*:") & ~acc["prev_ua"],
                   acc["gid"] + 1).otherwise(acc["gid"]).alias("gid"),
            # RFC 9309 ABNF: group = startgroupline *(startgroupline /
            # emptyline) *(rule / emptyline) — a blank (or comment-only,
            # already stripped to "") line between consecutive User-agent
            # lines does NOT close the startgroupline run, so the UA run
            # survives it; only an actual directive line ends the run.
            F.when(l == "", acc["prev_ua"])
            .otherwise(F.lower(l).rlike(r"^user-agent\s*:")).alias("prev_ua"),
            F.when(
                F.lower(l).rlike(r"^user-agent\s*:"),
                F.array_append(acc["out"], F.struct(
                    (F.when(~acc["prev_ua"], acc["gid"] + 1)
                     .otherwise(acc["gid"])).alias("gid"),
                    F.lower(_directive(l, "user-agent")).alias("ua"),
                    F.lit(None).cast("string").alias("pattern"),
                    F.lit(None).cast("boolean").alias("allow"),
                )),
            ).when(
                F.lower(l).rlike(r"^(allow|disallow)\s*:"),
                F.array_append(acc["out"], F.struct(
                    acc["gid"].alias("gid"),
                    F.lit(None).cast("string").alias("ua"),
                    F.coalesce(_directive(l, "allow"),
                               _directive(l, "disallow")).alias("pattern"),
                    F.lower(l).startswith("allow").alias("allow"),
                )),
            ).when(
                # crawl-delay rides as a pseudo-rule: pattern = the value,
                # allow = null distinguishes it from path rules (which
                # always carry a boolean) — _winning_rules filters on
                # allow IS NOT NULL so the verdict path never sees it
                F.lower(l).rlike(r"^crawl-delay\s*:"),
                F.array_append(acc["out"], F.struct(
                    acc["gid"].alias("gid"),
                    F.lit(None).cast("string").alias("ua"),
                    _directive(l, "crawl-delay").alias("pattern"),
                    F.lit(None).cast("boolean").alias("allow"),
                )),
            ).otherwise(acc["out"]).alias("out"),
        ),
        lambda acc: acc["out"],
    )
    return tagged


def _chosen_gids(tagged: Column, agent: str) -> Column:
    """gid array of the winning UA group: exact agent beats ``*``."""
    exact_gids = F.transform(
        F.filter(tagged, lambda t: t["ua"] == F.lit(agent.lower())),
        lambda t: t["gid"])
    star_gids = F.transform(
        F.filter(tagged, lambda t: t["ua"] == F.lit("*")),
        lambda t: t["gid"])
    return F.when(F.size(exact_gids) > 0, exact_gids).otherwise(star_gids)


def _winning_rules(tagged: Column, chosen: Column) -> Column:
    """array<struct<pattern,allow>> of the chosen group's non-empty rules.
    ``chosen`` must be a materialized COLUMN, not the _chosen_gids tree:
    the filter lambda evaluates its predicate per array element, and an
    embedded gid computation would re-run per element."""
    return F.transform(
        F.filter(
            tagged,
            lambda t: t["pattern"].isNotNull()
            & (t["pattern"] != "")
            & t["allow"].isNotNull()  # excludes crawl-delay pseudo-rules
            & F.array_contains(chosen, t["gid"]),
        ),
        lambda t: F.struct(t["pattern"].alias("pattern"),
                           t["allow"].alias("allow")),
    )


def parse_robots(robots: DataFrame, agent: str = "trainingbot",
                 host_col: str = "host", txt_col: str = "robots_txt") -> DataFrame:
    """(host, pattern, allow) rules for ``agent`` — one exploded row per
    rule of the winning user-agent group (exact agent beats ``*``; hosts
    whose winning group has no rules produce no rows = everything
    allowed).

    Staged as three narrow projections (tag -> choose group -> filter)
    so the line-tagging aggregate exists exactly ONCE in the plan;
    CollapseProject leaves multi-referenced non-cheap producers alone,
    so the stages survive optimization as separate projections. Input is
    truncated to the RFC 9309 §2.4 500 KiB parse limit (last complete
    line) before tagging — see ROBOTS_MAX_CHARS."""
    tagged = _tag_groups(
        _truncate_robots(F.coalesce(F.col(txt_col), F.lit(""))))
    return (robots
            .select(F.lower(F.col(host_col)).alias("host"),
                    tagged.alias("_tagged"))
            .select("host", "_tagged",
                    _chosen_gids(F.col("_tagged"), agent).alias("_chosen"))
            .select("host",
                    F.explode(_winning_rules(F.col("_tagged"),
                                             F.col("_chosen"))).alias("_r"))
            .select("host", F.col("_r.pattern").alias("pattern"),
                    F.col("_r.allow").alias("allow")))


def robots_host_meta(robots: DataFrame, agent: str = "trainingbot",
                     host_col: str = "host",
                     txt_col: str = "robots_txt") -> DataFrame:
    """Per-host politeness metadata beyond the path rules: the winning
    group's ``Crawl-delay`` (the de-facto convention RFC 9309 leaves
    unstandardized — exact agent group beats ``*``, first value in the
    group wins, non-numeric values are null) and every ``Sitemap`` URL
    (group-INDEPENDENT per the sitemaps.org protocol). One row per host:
    ``(host, crawl_delay double, sitemaps array<string>)``.

    Same plan shape as parse_robots: three narrow projections over the
    shared line-tagging aggregate, map-only, nothing on the driver — a
    crawl scheduler joins this against its frontier by host."""
    txt = _truncate_robots(F.coalesce(F.col(txt_col), F.lit("")))
    tagged = _tag_groups(txt)
    # staged: strip '#'-comments ONCE per line (same treatment every
    # other directive gets), then match/extract over the stripped line —
    # HOFs get no common-subexpression elimination, so nesting the strip
    # into both the predicate and the value would run the regex twice
    stripped = F.transform(
        F.split(txt, r"\r?\n"),
        # substring_index, not "#.*$" — see _tag_groups (O(n^2) regex)
        lambda l: F.trim(F.substring_index(l, "#", 1)))
    sitemaps = F.filter(
        F.transform(
            stripped,
            lambda l: F.when(
                F.lower(l).rlike(r"^sitemap\s*:"),
                F.trim(F.regexp_replace(l, r"(?i)^sitemap\s*:", "")),
            ),
        ),
        lambda v: v.isNotNull() & (v != ""),
    )
    delays = lambda chosen, t: F.filter(  # noqa: E731
        t, lambda r: r["pattern"].isNotNull() & r["allow"].isNull()
        & F.array_contains(chosen, r["gid"]))
    return (robots
            .select(F.lower(F.col(host_col)).alias("host"),
                    tagged.alias("_tagged"), sitemaps.alias("sitemaps"))
            .select("host", "_tagged", "sitemaps",
                    _chosen_gids(F.col("_tagged"), agent).alias("_chosen"))
            .select(
                "host",
                # F.get is null-safe out of bounds (element_at errors under
                # ANSI); try_cast nulls non-numeric delay values
                F.get(
                    F.transform(delays(F.col("_chosen"), F.col("_tagged")),
                                lambda r: r["pattern"]),
                    0,
                ).try_cast("double").alias("crawl_delay"),
                "sitemaps"))


def _pattern_regex(pattern: Column) -> Column:
    """robots path pattern -> anchored regex, natively: regex metachars
    escaped, ``*`` -> ``.*``, trailing ``$`` kept as the anchor."""
    anchored = pattern.endswith("$")
    body = F.when(anchored,
                  pattern.substr(F.lit(1), F.length(pattern) - 1)) \
        .otherwise(pattern)
    esc = F.regexp_replace(body, r"[.\^$+?()\[\]{}|\\]", r"\\$0")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), wild,
                    F.when(anchored, F.lit("$")).otherwise(F.lit("")))


def robots_filter(pages: DataFrame, robots: DataFrame,
                  agent: str = "trainingbot", url_col: str = "url",
                  keep_col: str = "robots_allowed",
                  max_rules_per_host: int = 5000) -> DataFrame:
    """pages + ``robots_allowed``: longest-match Allow/Disallow decision
    for each url's path-plus-query under its host's rules (allow wins
    length ties; no rules / no robots row => allowed). Rules match the
    path WITH its query string appended — the robots spec's match target
    — so ``Disallow: /*?`` and ``Disallow: /search?`` work.

    ``max_rules_per_host`` bounds the per-host rule array that rides the
    page join (the 500 KiB input truncation in parse_robots already caps
    text; this caps the pathological many-short-rules case). Retention is
    deterministic longest-pattern-first (ties broken on pattern regex,
    then Allow before Disallow): the decision rule is longest-match, so
    the patterns that can win a decision are kept preferentially. The
    default (5000) is far above any real robots.txt's winning group;
    ``None`` disables the cap."""
    # ONE-PASS shape: fold each host's rules into an ARRAY (the shuffle is
    # on the robots table — one row per host, orders of magnitude under the
    # page table), join pages to that array once on host, and decide the
    # longest match MAP-SIDE with higher-order functions. The page table is
    # never shuffled on url at all (the previous explode -> groupBy(url) ->
    # join-back shape paid two url-keyed shuffles of the full page table).
    rules = parse_robots(robots, agent)
    by_host = (rules
               .select(F.col("host").alias("_rhost"),
                       F.struct(_pattern_regex(F.col("pattern")).alias("re"),
                                F.length("pattern").alias("plen"),
                                F.col("allow").alias("allow")).alias("_r"))
               # groupBy tolerates duplicate host rows in the robots table
               # (their rule sets union, matching the exploded-join shape)
               .groupBy("_rhost").agg(F.collect_list("_r").alias("_rules")))
    if max_rules_per_host is not None:
        # sort key = (-plen, re, !allow): longest first, deterministic tie
        # order, Allow ahead of Disallow at equal (plen, re) so a cap cut
        # between twins keeps the permissive one (matching the decision
        # rule's allow-wins-ties). Runs on the robots side only — one tiny
        # row per host — never on the page table.
        ranked = F.array_sort(F.transform(
            F.col("_rules"),
            lambda r: F.struct((-r["plen"]).alias("_nl"), r["re"].alias("re"),
                               (~r["allow"]).alias("_na"),
                               r["plen"].alias("plen"),
                               r["allow"].alias("allow"))))
        capped = F.transform(
            F.slice(ranked, 1, max_rules_per_host),
            lambda r: F.struct(r["re"].alias("re"), r["plen"].alias("plen"),
                               r["allow"].alias("allow")))
        by_host = by_host.select(
            "_rhost",
            F.when(F.size("_rules") > max_rules_per_host, capped)
             .otherwise(F.col("_rules")).alias("_rules"))
    path = F.coalesce(F.try_parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    path = F.when(path == "", "/").otherwise(path)
    query = F.try_parse_url(F.col(url_col), F.lit("QUERY"))
    target = F.when(query.isNotNull(),
                    F.concat(path, F.lit("?"), query)).otherwise(path)
    joined = (pages
              .withColumn("_host", url_host(url_col, strip_www=False))
              .withColumn("_tgt", target)
              .join(by_host, F.col("_host") == F.col("_rhost"), "left"))
    # longest matching rule; allow=true wins ties -> max of (len, allow)
    # structs over the matching subset (array_max of an empty/null array is
    # null -> allowed, the spec default)
    hits = F.filter(F.col("_rules"),
                    lambda r: F.regexp_like(F.col("_tgt"), r["re"]))
    best = F.array_max(F.transform(
        hits, lambda r: F.struct(r["plen"].alias("l"), r["allow"].alias("a"))))
    return (joined
            .withColumn(keep_col, F.coalesce(best["a"], F.lit(True)))
            .drop("_rhost", "_rules", "_host", "_tgt"))
