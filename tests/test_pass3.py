"""Pass-3 aggressive_loose_cluster fixtures (ref:
backend/scripts/enrich_silver_costs_pass3.js:36-118): delimiter inference,
$5k/repeating-token/row-count guards, header confidence, reported-total
look-ahead, and the only-when-empty gating."""

from pdfextractor_spark.extraction.pass3 import (
    enrich_report_pass3,
    infer_table_from_cluster,
    scan_loose_clusters,
)
from pdfextractor_spark.extraction.report import build_structured_report
from pdfextractor_spark.extraction.sections import naive_sectionize

CLUSTER_TEXT = """Project Budget Overview
Riparian Buffer Establishment  120 ac  $48,000.00
Grade Stabilization  14 each  $21,700.00
Sediment Basin Construction  6 each  $18,300.00
Nutrient Management Plan  800 ac  $9,600.00
narrative filler line
Total project cost $99,100.00
"""

TAB_TEXT = (
    "some prose\n"
    "Fencing\t2400 lf\t$12,000.00\n"
    "Pond Retrofit\t3 each\t$7,500.00\n"
    "Heavy Use Area\t5 each\t$6,250.00\n"
)


def test_cluster_detection_and_pinned_totals():
    clusters = scan_loose_clusters(CLUSTER_TEXT)
    assert len(clusters) == 1 and len(clusters[0]["lines"]) == 4
    lines = [l.strip() for l in CLUSTER_TEXT.split("\n")]
    parsed = infer_table_from_cluster(clusters[0], lines)
    assert parsed is not None
    norm = parsed["normalized"]
    assert norm["patternId"] == "aggressive_loose_cluster"
    assert norm["totalComputed"] == 97600.0
    assert norm["totalReported"] == 99100.0  # look-ahead Total line
    assert norm["discrepancy"] == 1500.0
    assert norm["patternConfidence"] == 0.6  # 'Budget' header within 3 lines
    assert [r["name"] for r in norm["rows"]] == [
        "Riparian Buffer Establishment", "Grade Stabilization",
        "Sediment Basin Construction", "Nutrient Management Plan",
    ]
    assert norm["rows"][0]["rawSize"] == "120 ac"


def test_tab_delimiter_and_no_header_confidence():
    clusters = scan_loose_clusters(TAB_TEXT)
    parsed = infer_table_from_cluster(clusters[0], [l.strip() for l in TAB_TEXT.split("\n")])
    assert parsed["normalized"]["patternConfidence"] == 0.55  # no header keyword
    assert parsed["normalized"]["totalComputed"] == 25750.0
    assert parsed["table"]["rows"][0]["Size/Amount"] == "2400 lf"


def test_sub_5k_and_repetition_guards():
    small = "a $1\nb $2\nc $3\nItem A  $1,200\nItem B  $900\nItem C  $800\n"
    lines = [l.strip() for l in small.split("\n")]
    clusters = scan_loose_clusters(small)
    assert all(infer_table_from_cluster(c, lines) is None for c in clusters)  # < $5k
    legend = "Note  $2,000\nNote  $2,100\nNote  $2,200\nNote  $2,300\n"
    lines = [l.strip() for l in legend.split("\n")]
    (c,) = scan_loose_clusters(legend)
    assert infer_table_from_cluster(c, lines) is None  # >60% repeating first token


def test_enrich_only_when_report_has_no_tables():
    report = {"bmpCostTablesNormalized": [{"patternId": "practice_costs"}]}
    res = enrich_report_pass3(report, CLUSTER_TEXT)
    assert res == {"added": False, "tables": 0}
    report = {"bmpCostTablesNormalized": []}
    res = enrich_report_pass3(report, CLUSTER_TEXT)
    assert res["added"] and res["tables"] == 1
    assert report["metadata"]["enrichedCostsPass3"] is True
    assert report["bmpCostTables"][0]["id"] == "aggressive_cluster_1"


def test_build_structured_report_opt_in():
    # a doc whose $ lines are too sparse for the registry patterns but form
    # a pass-3 cluster; default build leaves tables empty, opt-in enriches.
    # Keep the per-line dollar count below the sparse_inline_costs window
    # threshold by separating the money lines from other content.
    text = TAB_TEXT
    sections = naive_sectionize(text)
    base = build_structured_report(sections, source_id="x", source_file="x.pdf",
                                   raw_text=text, raw_tables=False)
    enriched = build_structured_report(sections, source_id="x", source_file="x.pdf",
                                       raw_text=text, raw_tables=False, enrich_pass3=True)
    base_pats = [t["patternId"] for t in (base.get("bmpCostTablesNormalized") or [])]
    enr_pats = [t["patternId"] for t in (enriched.get("bmpCostTablesNormalized") or [])]
    if not base_pats:
        assert "aggressive_loose_cluster" in enr_pats
    else:  # registry caught it first: pass-3 must then be a no-op
        assert enr_pats == base_pats
