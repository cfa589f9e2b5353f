"""Entity extractor tests: goals (E1), BMPs (E2/P3/E5), activities (E3)."""

from pdfextractor_spark.extraction.activities import (
    extract_activities,
    parse_monitoring,
    parse_outreach,
)
from pdfextractor_spark.extraction.bmps import (
    categorize_bmp_name,
    extract_bmps,
    filter_bmps,
    strip_cost_tail,
)
from pdfextractor_spark.extraction.goals import extract_goals, join_wrapped_lines


def test_goal_quantitative_fields():
    # NOTE: a trailing ". Responsible: MDEQ." would be split into its own
    # sentence and dropped (no goal pattern) — reference does the same, so
    # responsible must appear in the same sentence to be captured.
    goals = extract_goals(["Reduce phosphorus from 45 mg/L to 30 mg/L by 2027, lead: MDEQ here."])
    assert len(goals) == 1
    g = goals[0]
    assert g["pollutant"] == "phosphorus"
    assert g["baselineValue"] == 45.0
    assert g["targetValue"] == 30.0
    assert g["deadlineYear"] == "2027"
    assert g["responsible"] == "MDEQ here"
    assert g["deadline"] == "2027-12-31"


def test_goal_ids_sequence():
    goals = extract_goals([
        "The overall goal is to reduce sediment by 20 percent by 2026.",
        "Our goal is to restore dissolved oxygen to attain 5 mg/L levels.",
    ])
    assert [g["id"] for g in goals] == [f"G{i+1}" for i in range(len(goals))]
    assert len(goals) >= 2


def test_goal_discards_non_primary_prose():
    # no explicit primary phrase, no quantitative pattern -> dropped
    goals = extract_goals(["This plan describes general conditions in the basin."])
    assert goals == []


def test_goal_dry_creek_early_override():
    lines = [
        "Dry Creek Watershed Plan 3",
        "The ultimate goal is to bring about behavior changes and the use of",
        '"best management practices" that will improve water quality and the',
        "overall quality of life in the watershed.",
    ]
    goals = extract_goals(lines)
    assert goals[0]["primaryReason"] == "early_canonical_dry_creek"
    assert goals[0]["confidence"] == 0.65
    assert goals[0]["title"].endswith("quality of life in the watershed.")


def test_join_wrapped_lines_merges_continuations():
    out = join_wrapped_lines([
        "The goal is to",
        "improve water quality substantially.",
        "",
        "Standalone line.",
    ])
    assert out[0] == "The goal is to improve water quality substantially."
    assert "Standalone line." in out


def test_extract_bmps_category_and_quantity():
    bmps = extract_bmps(["Install riparian buffer along 2,500 feet of streambank."])
    assert len(bmps) == 1
    b = bmps[0]
    assert b["id"] == "B1"
    assert b["category"] == "Vegetative Buffer"
    assert b["quantity"] == 2500.0
    assert b["unit"] == "feet"
    assert b["verb"] == "install"  # reference lowercases the verb
    assert b["confidence"] == 0.8  # .3 term + .25 qty + .15 verb + .1 category


def test_filter_bmps_rejects_noise():
    bmps = extract_bmps([
        "Months 1 - 12",
        "Phase 2 activities",
        "Install sediment basin near the outlet.",
    ])
    kept, rejected = filter_bmps(bmps)
    kept_names = [b["name"] for b in kept]
    assert "Install sediment basin near the outlet." in kept_names
    assert all("Months 1 - 12" != b["name"] for b in kept)
    assert all(r.get("rejectReasons") for r in rejected)


def test_categorize_bmp_name():
    assert categorize_bmp_name("Grade stabilization structure") is not None
    assert categorize_bmp_name("zzz unknown practice") is None


def test_strip_cost_tail():
    assert strip_cost_tail("Fencing 10,000 ft @ $2.50").startswith("Fencing")
    assert "$" not in strip_cost_tail("Cover Crops $48,000")


def test_extract_activities():
    acts = extract_activities([
        "Monitor water quality quarterly through 2027.",
        "Conduct landowner training workshops annually.",
        "No verbs here at all, just words.",
    ])
    ids = [a["id"] for a in acts]
    assert ids == [f"A{i+1}" for i in range(len(acts))]
    assert len(acts) == 2
    a = acts[0]
    assert a["verb"] == "monitor"  # reference lowercases
    assert a["frequency"] == "quarterly"
    assert a["dueYear"] == "2027"


def test_parse_monitoring_outreach():
    mon = parse_monitoring(["TSS at WQ-1", "DO profiles"])
    assert [m["id"] for m in mon] == ["M1", "M2"]
    out = parse_outreach(["Community workshops for the public", "School programs"])
    assert out[0]["audience"] == "Community"
    assert out[1]["audience"] == "Education"
