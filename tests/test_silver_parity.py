"""Real-corpus silver parity gate: our sectionizers + report builder re-run
over the reference's shipped bronze, scored with its own P/R/F1 scheme
(backend/validation/evaluate.js, threshold 0.9) against its shipped silver.

Covers a representative per-document subset (one per distinct base slug) to
stay fast; scripts_parity_silver.py covers all 69.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

SILVER_DIR = "/root/reference/data/silver"
BRONZE_DIR = "/root/reference/data/bronze"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(SILVER_DIR) and os.path.isdir(BRONZE_DIR)),
    reason="reference corpus not available",
)

# the reference's own E8 disk-read no-op shipped a truncated goal here (see
# PARITY_SILVER.md adjudication) — our always-available-raw-text semantics
# intentionally diverge
KNOWN_REFERENCE_NOOPS = {"bear-lake-9-key-elelment-plan-2018-2"}


def _base_slugs():
    seen = {}
    for spath in sorted(glob.glob(os.path.join(SILVER_DIR, "*.json"))):
        slug = os.path.basename(spath)[:-5]
        base = re.sub(r"-\d+$", "", slug)
        seen.setdefault(base, slug)
    return sorted(seen.values())


def test_silver_entity_parity_per_base_doc():
    from scripts_parity_silver import build_ours, load_bronze_text, score, used_process_route

    scored = 0
    failures = []
    for slug in _base_slugs():
        if slug in KNOWN_REFERENCE_NOOPS:
            continue
        raw = load_bronze_text(slug)
        if raw is None:
            continue
        ref = json.load(open(os.path.join(SILVER_DIR, f"{slug}.json")))
        ours = build_ours(raw, slug, f"{slug}.pdf", used_process_route(ref))
        sc = score(ours, ref)
        scored += 1
        for cat in ("goals", "bmps", "activities", "monitoring"):
            s = sc[cat]
            if (s["goldCount"] or s["extractedCount"]) and s["f1"] < 0.9:
                failures.append((slug, cat, round(s["f1"], 3)))
    assert scored >= 14, f"expected >=14 base docs with bronze, scored {scored}"
    assert not failures, f"categories under the reference's 0.9 threshold: {failures}"
