"""Deterministic rule classifier for uncategorized lines (replaces the
reference's key-gated OpenAI classifier, classifier.js:9-36)."""

from pdfextractor_spark.extraction.classifier import classify_ambiguous, score_line
from pdfextractor_spark.extraction.sections import empty_sections


def _sections(lines):
    s = empty_sections(extra_activities=True)
    s["uncategorized"] = list(lines)
    return s


def test_lines_move_to_best_label():
    s = _sections([
        "Monitoring will include monthly sampling at three stations.",
        "Public workshops educate landowners on conservation.",
        "The watershed covers 45 square miles across two counties.",
        "Install grade stabilization structures along the creek banks.",  # BMP + Geo
        "completely neutral line with no keywords",
    ])
    out = classify_ambiguous(s)
    assert "Monitoring will include monthly sampling at three stations." in out["Monitoring"]
    assert "Public workshops educate landowners on conservation." in out["Outreach"]
    assert "The watershed covers 45 square miles across two counties." in out["Geography"]
    # 'install ... structures' scores Implementation(1: install) vs BMPs(1: grade
    # stabilization) vs Geography(1: creek) -> tie resolves to earliest label (BMPs)
    assert "Install grade stabilization structures along the creek banks." in out["BMPs"]
    # unmatched lines STAY uncategorized (E6/E7 fallbacks still see them)
    assert out["uncategorized"] == ["completely neutral line with no keywords"]


def test_tie_resolves_in_reference_section_order():
    line = "reduce sediment with cover crops"  # Goals(reduce) vs BMPs(cover crops)
    scores = score_line(line)
    assert scores["Goals"] == scores["BMPs"] == 1
    out = classify_ambiguous(_sections([line]))
    assert line in out["Goals"] and line not in out["BMPs"]


def test_classifier_deterministic_and_off_by_default():
    lines = ["Monitoring stations measure water quality data."] * 3
    a = classify_ambiguous(_sections(lines))
    b = classify_ambiguous(_sections(lines))
    assert a == b
    # off by default in the silver row builder
    from pdfextractor_spark.pipeline.silver import build_report_row

    text = "Header\nMonitoring will include monthly sampling at three stations."
    base = build_report_row("u", "en", text)
    on = build_report_row("u", "en", text, classify=True)
    assert on["monitoring_count"] >= base["monitoring_count"]
