"""Dollar-cluster discovery (discover_missing_cost_clusters.js twin)."""

import pyspark.sql.functions as F

from pdfextractor_spark.extraction.clusters import find_cost_clusters


def test_find_cost_clusters_semantics():
    lines = (
        ["intro text", "no money here"]
        + [f"Practice {i} $1,{i}00 cost share" for i in range(5)]  # cluster 1
        + ["filler", "filler", "filler"]          # 3 non-dollar: run continues
        + ["tail $999 line"]                       # still cluster 1
        + ["a", "b", "c", "d"]                     # >3 non-dollar: cluster ends
        + ["$5 lonely", "x", "x", "x", "x"]        # <4 money in window: skipped
        + ["$1 a", "$2 b", "$3 c"]                 # with lonely: still <4 -> skipped
    )
    clusters = find_cost_clusters(lines)
    assert len(clusters) == 1
    (c,) = clusters
    assert c["start_line"] == 3 and c["end_line"] == 11  # 1-based, tail $999
    assert c["money_line_count"] == 6
    assert c["header_signature"] == "Practice 0 $1,000 cost share"
    assert len(c["sample"]) == 9  # whole 9-line span (cap is 12)

    # hard section header ends a cluster even mid-money-run (case-insensitive)
    lines2 = [f"row {i} $10" for i in range(4)] + ["goal: reduce X"] + ["$99 after"]
    clusters2 = find_cost_clusters(lines2)
    assert clusters2[0]["end_line"] == 4
    # "$99 after" alone can't form a cluster (only 1 money line in window)
    assert len(clusters2) == 1

    # sample capped at 12 lines; signature squashed and capped at 120 chars
    big = [f"item\t\t{i}   ${i}00 " + "pad " * 60 for i in range(20)]
    (c3,) = find_cost_clusters(big)
    assert len(c3["sample"]) == 12
    assert "\t" not in c3["header_signature"]
    assert len(c3["header_signature"]) == 120

    assert find_cost_clusters([]) == []
    assert find_cost_clusters(["no dollars at all"] * 200) == []


def test_discover_missing_cost_clusters_spark(spark):
    from pdfextractor_spark.pipeline.gold import discover_missing_cost_clusters

    money_text = "\n".join(
        ["Watershed intro"] + [f"BMP {i} $2,{i}00" for i in range(6)])
    bronze = spark.createDataFrame(
        [("u-missing", money_text), ("u-covered", money_text),
         ("u-missing-nomoney", "plain text only"), ("u-null", None)],
        "url string, raw_text string")
    silver = spark.createDataFrame(
        [("u-missing", []), ("u-covered", [("p1",)]),
         ("u-missing-nomoney", []), ("u-null", [])],
        "url string, cost_tables array<struct<pattern_id:string>>")
    out = discover_missing_cost_clusters(silver, bronze, num_partitions=2).collect()
    assert [r["url"] for r in out] == ["u-missing"]  # covered/none/null excluded
    assert out[0]["money_line_count"] == 6
    assert out[0]["header_signature"].startswith("BMP 0 $2,000")
    # no Python UDF before the semi-join prune: only urls shuffle to it
    plan = discover_missing_cost_clusters(silver, bronze)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "LeftSemi" in plan


def test_silver_anomaly_audit(spark):
    """audit_silver_coverage.js twin: zero-coverage flags, suspicious slug
    heuristics, short-title samples, and the corpus rollup."""
    from pdfextractor_spark.pipeline.gold import (
        silver_anomaly_audit, silver_anomaly_summary,
    )

    goals = "array<struct<title:string>>"
    bmps = "array<struct<name:string>>"
    rows = [
        ("http://x/dry-creek-watershed-plan", [("Reduce sediment by 20%",), ("Too short",)],
         [("Cover crops",), ("Fencing",)]),
        ("http://x/bad__slug", [], [("Ok name",)]),
        ("http://x/watersehd-elelment-plan-x", [("A goal with enough words",)], []),
        ("http://x/ab", [("Fine goal here",)], [("Grade stabilization",)]),
    ]
    silver = spark.createDataFrame(rows, f"url string, goals {goals}, bmps {bmps}")
    by = {r["id"]: r for r in silver_anomaly_audit(silver).collect()}

    ok = by["dry-creek-watershed-plan"]
    assert not ok["zero_goals"] and ok["suspicious_title"] is None
    assert ok["bad_goal_samples"] == ["Too short"]  # <3 words sampled
    assert ok["bad_bmp_samples"] == ["Fencing"]     # 1-word BMP name sampled

    bad = by["bad__slug"]
    assert bad["zero_goals"] and not bad["zero_bmps"]
    assert "double_underscore" in bad["suspicious_title"]
    assert bad["bad_bmp_samples"] is None           # "Ok name" is 2 words
    typo = by["watersehd-elelment-plan-x"]
    assert set(typo["suspicious_title"]) == {"typo:element", "typo:watershed"}
    assert typo["zero_bmps"]
    assert "too_short_tokens" in by["ab"]["suspicious_title"]

    (s,) = silver_anomaly_summary(silver).collect()
    assert s["total"] == 4 and s["zero_goal"] == 1 and s["zero_bmp"] == 1
    assert s["total_goals"] == 4 and s["suspicious_titles"] == 3
    assert abs(s["avg_goals"] - 1.0) < 1e-9


def test_bronze_content_audit(spark):
    """analyze_bronze_bmps_costs.js twin: line-hint counts + the
    abrupt-ending truncation heuristic, all native HOFs."""
    from pdfextractor_spark.pipeline.gold import (
        bronze_content_audit, bronze_content_audit_summary,
    )

    doc_rich = "\n".join([
        "Intro line.",
        "Activity Size/Amount Estimated Cost",   # cost header
        "Fencing 1,200 ft $4,500.00",            # cost + bmp hint
        "Education and outreach meetings",        # activity hint
        "100 @ $25",                              # qty @ $ cost line
        "All work completed on schedule.",        # clean punctuated ending
    ])
    doc_trunc_word = "A sentence that stops abruptly in implementationact"
    doc_trunc_fig = "Long opening line with plenty of text here.\nSee Figure 12\nshort tail"
    doc_clean = "Just one proper sentence."
    bronze = spark.createDataFrame(
        [("u1", doc_rich), ("u2", doc_trunc_word), ("u3", doc_trunc_fig),
         ("u4", doc_clean), ("u5", None)],
        "url string, raw_text string")
    by = {r["url"]: r for r in bronze_content_audit(bronze).collect()}
    assert by["u1"]["cost_header"] and by["u1"]["cost_lines"] == 2
    assert by["u1"]["bmp_lines"] == 1 and by["u1"]["activity_lines"] >= 1
    assert not by["u1"]["suspected_trunc"]
    assert by["u2"]["suspected_trunc"]       # >=12-char word, no punctuation
    assert by["u3"]["suspected_trunc"]       # short tail after a Figure ref
    assert not by["u4"]["suspected_trunc"]
    assert not by["u5"]["suspected_trunc"] and by["u5"]["length"] == 0

    (s,) = bronze_content_audit_summary(bronze).collect()
    assert s["total_files"] == 5 and s["with_cost_header"] == 1
    assert s["suspected_truncation"] == 2 and s["with_cost_lines"] == 1


def test_uncaptured_cost_lines(spark):
    """audit_cost_patterns.js twin: cue+money lines flagged unless a
    detected table title contains the line's first 30 chars."""
    from pdfextractor_spark.pipeline.gold import uncaptured_cost_lines

    text = "\n".join([
        "Intro.",
        "Fencing total cost $12,500.00",           # cue+money, uncovered
        "Unit Cost Schedule $3,000",               # cue+money, covered below
        "Just $9,999 with no cue word",            # money, no cue
        "budget narrative without dollars",        # cue, no money
    ])
    ct = "array<struct<title:string>>"
    bronze = spark.createDataFrame([("u1", text), ("u2", None)],
                                   "url string, raw_text string")
    silver = spark.createDataFrame(
        [("u1", [("Unit Cost Schedule $3,000 and more context",)]),
         ("u2", [])], f"url string, cost_tables {ct}")
    out = uncaptured_cost_lines(silver, bronze).collect()
    assert [(r["url"], r["line"]) for r in out] == [("u1", 2)]
    assert out[0]["text"] == "Fencing total cost $12,500.00"
