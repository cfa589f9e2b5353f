"""Golden regression: the committed corpus_golden.json pins extracted-text
bytes (sha256), parser routing, byte-parity, entity counts, and cost-table
normalized totals for the first 130 synthetic docs. Any extraction-semantics
drift fails here; re-bless intentionally via `python tests/make_golden.py`."""

import json
import os

from tests.make_golden import N_DOCS, build_golden

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "corpus_golden.json")


def test_corpus_matches_golden():
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    current = build_golden()
    assert len(current) == len(golden) == N_DOCS
    mismatches = []
    for url, g in golden.items():
        c = current.get(url)
        if c != g:
            diff_keys = [k for k in g if c is None or c.get(k) != g.get(k)]
            mismatches.append((url, diff_keys))
    assert not mismatches, f"golden drift in {len(mismatches)} docs: {mismatches[:5]}"


def test_golden_has_full_shape_coverage():
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    parsers = {g["parser"] for g in golden.values()}
    assert parsers == {"pdf", "html", "error"}
    # every parity row must be byte-identical
    parity = [g["parity"] for g in golden.values() if g["parity"] is not None]
    assert parity and all(parity)
    # the cost-table pattern families exercised by the corpus
    pats = {t["pattern_id"] for g in golden.values() for t in g.get("tables", [])}
    for expected in ["booths_creek_bmps", "bell_creek_bmps", "phase1_bmps",
                     "multi_funding_source_costs", "practice_unit_nrcs_costs",
                     "implementation_plan_coded_budget", "tech_assistance",
                     "sparse_inline_costs", "narrative_cost_block"]:
        assert expected in pats, f"{expected} never fired on the corpus"


def test_full_report_json_digest_2000_docs():
    """TOTAL invariant over the silver stage: sha256 of every report_json
    byte across 2000 synthetic docs (15x the per-field golden above). Any
    drift anywhere in extraction — goals, BMPs, cost tables, confidences,
    field order — fails here. Perf refactors must keep this digest
    bit-identical; re-bless only for an intentional semantics change."""
    import hashlib

    from pdfextractor_spark.corpus import generate_pages
    from pdfextractor_spark.pipeline.bronze import _extract_one
    from pdfextractor_spark.pipeline.silver import build_report_row

    digests = []
    for r in generate_pages(2000):
        raw = _extract_one(r["html"], r["text"])[0]
        rep = build_report_row(r["url"], r["lang"], raw)
        digests.append(hashlib.sha256((rep["report_json"] or "").encode()).hexdigest())
    combined = hashlib.sha256("".join(digests).encode()).hexdigest()
    assert combined == "738f2d38ceca0c9cb70176fb1fb5570d2a25ca73a56fbf53b9a1c788dc3fba47"
