"""Sectionizer tests (P1 exact-header scan, P2 naive batch predicates)."""

from pdfextractor_spark.extraction.sections import extract_sections, naive_sectionize

DOC = """Watershed Plan
Goals
Reduce sediment by 20% by 2026.
Protect the aquifer.

BMPs
Install riparian buffer.

Monitoring:
Monthly sampling at WQ-1.
Random trailing line.
"""


def test_extract_sections_exact_headers():
    s = extract_sections(DOC)
    assert s["Goals"] == ["Reduce sediment by 20% by 2026.", "Protect the aquifer."]
    assert s["BMPs"] == ["Install riparian buffer."]
    # header with trailing colon still matches (^(H)[:]?$)
    assert s["Monitoring"] == ["Monthly sampling at WQ-1.", "Random trailing line."]
    assert s["uncategorized"] == ["Watershed Plan"]
    assert s["Outreach"] == []


def test_extract_sections_header_case_insensitive():
    s = extract_sections("goals\nline a\nGEOGRAPHY\nline b")
    assert s["Goals"] == ["line a"]
    assert s["Geography"] == ["line b"]


def test_naive_sectionize_goal_and_cost_buckets():
    s = naive_sectionize("The goal is clear.\nFencing $2.50 per ft\nplain narrative")
    assert s["Goals"] == ["The goal is clear."]
    assert s["BMPs"] == ["Fencing $2.50 per ft"]
    assert s["uncategorized"] == ["plain narrative"]


def test_naive_sectionize_goal_cap_50():
    text = "\n".join(f"goal line {i}" for i in range(60))
    s = naive_sectionize(text)
    assert len(s["Goals"]) == 50
    # overflow lines fall to uncategorized
    assert len(s["uncategorized"]) == 10


def test_naive_line_can_hit_both_buckets():
    s = naive_sectionize("The goal costs $5,000 to achieve")
    assert s["Goals"] == ["The goal costs $5,000 to achieve"]
    assert s["BMPs"] == ["The goal costs $5,000 to achieve"]
    assert s["uncategorized"] == []
