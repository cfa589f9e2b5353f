"""Regenerate tests/golden/corpus_golden.json (run manually after an
INTENTIONAL extraction-semantics change; the diff is the review surface).

    python tests/make_golden.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 130  # covers all 13 shapes x2 pdf/html variants + skew + corrupt


def build_golden() -> dict:
    from pdfextractor_spark.corpus import generate_pages
    from pdfextractor_spark.pipeline.bronze import _extract_one
    from pdfextractor_spark.pipeline.silver import build_report_row

    rows = generate_pages(N_DOCS)
    out = {}
    for r in rows:
        raw, parser, n_pages, err, _enc = _extract_one(r["html"], r["text"])
        entry = {
            "parser": parser,
            "error": err,
            "n_pages": n_pages,
            "text_sha256": hashlib.sha256(raw.encode()).hexdigest() if raw else None,
            "n_chars": len(raw) if raw else None,
            "parity": (raw == r["text"]) if (r["text"] is not None and raw is not None) else None,
        }
        if raw is not None:
            silver = build_report_row(r["url"], r["lang"], raw)
            entry.update({
                "total_goals": silver["total_goals"],
                "total_bmps": silver["total_bmps"],
                "total_activities": silver["total_activities"],
                "primary_goals": silver["primary_goals"],
                "tables": [
                    {"pattern_id": t["pattern_id"],
                     "total_computed": t["total_computed"],
                     "total_reported": t["total_reported"],
                     "n_rows": len(t["rows"])}
                    for t in silver["cost_tables"]
                ],
            })
        out[r["url"]] = entry
    return out


if __name__ == "__main__":
    golden = build_golden()
    path = os.path.join(os.path.dirname(__file__), "golden", "corpus_golden.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"wrote {path}: {len(golden)} docs")
