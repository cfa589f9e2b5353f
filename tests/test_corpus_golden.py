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
