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
