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

Rule matching explodes pages x their-host's-rules (robots files average
a few dozen rules), so the operator is one broadcast-or-shuffle join and
one per-url aggregation — the same shape as the PSL fold.

At 100 TB: the robots side is one row per HOST (~10^8), orders of
magnitude under the page table; the join shuffles on host where the
page side is already clustered after the per-host stages, and the rule
explosion multiplies rows by the rule count only inside the join stage,
never materialized.

Reference parity note: the reference repo has no crawl-politeness
surface; this implements the graft brief's webtext capability from the
published spec (RFC 9309).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .urls import url_host

__all__ = ["parse_robots", "robots_filter"]


def _rules_for_agent(txt: Column, agent: str) -> Column:
    """array<struct<pattern,allow>> for the best-matching UA group."""
    lines = F.transform(
        F.split(txt, r"\r?\n"),
        # strip comments + surrounding whitespace
        lambda l: F.trim(F.regexp_replace(l, "#.*$", "")),
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
            F.lower(l).rlike(r"^user-agent\s*:").alias("prev_ua"),
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
            ).otherwise(acc["out"]).alias("out"),
        ),
        lambda acc: acc["out"],
    )
    agent_lc = agent.lower()
    # gids whose UA set names our agent exactly / via '*'
    exact_gids = F.transform(
        F.filter(tagged, lambda t: t["ua"] == F.lit(agent_lc)),
        lambda t: t["gid"])
    star_gids = F.transform(
        F.filter(tagged, lambda t: t["ua"] == F.lit("*")),
        lambda t: t["gid"])
    chosen = F.when(F.size(exact_gids) > 0, exact_gids).otherwise(star_gids)
    return F.transform(
        F.filter(
            tagged,
            lambda t: t["pattern"].isNotNull()
            & (t["pattern"] != "")
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
    allowed)."""
    rules = _rules_for_agent(F.coalesce(F.col(txt_col), F.lit("")), agent)
    return (robots
            .select(F.lower(F.col(host_col)).alias("host"),
                    F.explode(rules).alias("_r"))
            .select("host", F.col("_r.pattern").alias("pattern"),
                    F.col("_r.allow").alias("allow")))


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
                  keep_col: str = "robots_allowed") -> DataFrame:
    """pages + ``robots_allowed``: longest-match Allow/Disallow decision
    for each url's path-plus-query under its host's rules (allow wins
    length ties; no rules / no robots row => allowed). Rules match the
    path WITH its query string appended — the robots spec's match target
    — so ``Disallow: /*?`` and ``Disallow: /search?`` work."""
    rules = parse_robots(robots, agent)
    rules = rules.withColumn("_re", _pattern_regex(F.col("pattern"))) \
        .withColumn("_plen", F.length("pattern"))
    path = F.coalesce(F.try_parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    path = F.when(path == "", "/").otherwise(path)
    query = F.try_parse_url(F.col(url_col), F.lit("QUERY"))
    target = F.when(query.isNotNull(),
                    F.concat(path, F.lit("?"), query)).otherwise(path)
    p = pages.withColumn("_host", url_host(url_col, strip_www=False)) \
        .withColumn("_path", target)
    joined = p.select(F.col(url_col).alias("_u"), "_host", "_path") \
        .join(rules, p["_host"] == rules["host"], "left") \
        .withColumn("_hit", F.regexp_like(F.col("_path"), F.col("_re")))
    verdict = (
        joined.groupBy("_u").agg(
            # longest matching rule; allow=true wins ties -> order by
            # (len, allow) and take the max struct
            F.max(F.when(F.col("_hit"),
                         F.struct(F.col("_plen").alias("l"),
                                  F.col("allow").alias("a")))).alias("_best"))
        .select(F.col("_u"),
                F.coalesce(F.col("_best.a"), F.lit(True)).alias(keep_col))
    )
    return pages.join(verdict, pages[url_col] == verdict["_u"], "left") \
        .drop("_u") \
        .withColumn(keep_col, F.coalesce(F.col(keep_col), F.lit(True)))
