#!/usr/bin/env python3
"""Real-corpus SILVER parity: rebuild the reference's shipped silver reports
from their bronze inputs with OUR extraction stack and score entity parity
with the reference's own P/R/F1 scheme (backend/validation/evaluate.js:34-44,
threshold 0.9).

Input reconstruction mirrors the reference's own pipelines:
- silver with ``_present`` flags  -> the /process route: extractSections (P1)
  over the bronze rawText (backend/routes/process.js:45-81)
- silver without                  -> the batch path: naiveSectionize (P2)
  (backend/scripts/batch_silver_mdeq.js:59-104)
- bronze = data/bronze/<slug>.json rawText, else numerically-sorted
  <slug>-N.json slices joined with "\\n\\f\\n" (batch_silver loadBronze)

Usage: python scripts_parity_silver.py [--write-report] [slug-filter]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

SILVER_DIR = "/root/reference/data/silver"
BRONZE_DIR = "/root/reference/data/bronze"
REPORT = "PARITY_SILVER.md"
CATEGORIES = [
    ("goals", "title"),
    ("bmps", "name"),
    ("activities", "title"),
    ("monitoring", "metric"),
]


def load_bronze_text(slug: str) -> str | None:
    base = os.path.join(BRONZE_DIR, f"{slug}.json")
    if os.path.exists(base):
        j = json.load(open(base))
        return j.get("rawText") or j.get("text") or None
    slices = []
    for f in glob.glob(os.path.join(BRONZE_DIR, f"{slug}-[0-9]*.json")):
        m = re.search(r"-(\d+)\.json$", f)
        if m:
            slices.append((int(m.group(1)), f))
    if not slices:
        return None
    parts = []
    for _, f in sorted(slices):
        j = json.load(open(f))
        parts.append(j.get("rawText") or j.get("text") or "")
    return "\n\f\n".join(parts)


def used_process_route(silver: dict) -> bool:
    return any("_present" in g for g in silver.get("goals", [])) or any(
        "_present" in b for b in silver.get("bmps", [])
    )


def build_ours(raw_text: str, slug: str, source_file: str, process_route: bool) -> dict:
    from pdfextractor_spark.extraction.report import build_structured_report
    from pdfextractor_spark.extraction.sections import extract_sections, naive_sectionize

    sections = extract_sections(raw_text) if process_route else naive_sectionize(raw_text)
    # the reference resolves the whole raw text in BOTH routes (the
    # __RAW_WHOLE_TEXT__ global in /process, a disk read of the bronze file
    # in batch — reportBuilder.js:893-960), so E8/E6 always see it here
    return build_structured_report(sections, source_id=slug, source_file=source_file,
                                   raw_text=raw_text, raw_tables=False)


def score(ours: dict, ref: dict) -> dict:
    from pdfextractor_spark.validation import evaluate_set

    out = {}
    for cat, key in CATEGORIES:
        gold = [str(x.get(key) or "") for x in ref.get(cat) or []]
        prod = [str(x.get(key) or "") for x in ours.get(cat) or []]
        out[cat] = evaluate_set(gold, prod)
    ref_tables = ref.get("bmpCostTablesNormalized") or []
    our_tables = ours.get("bmpCostTablesNormalized") or []
    out["cost_tables"] = {
        "ref_n": len(ref_tables),
        "ours_n": len(our_tables),
        "ref_patterns": sorted(t.get("patternId") or "" for t in ref_tables),
        "ours_patterns": sorted(t.get("patternId") or "" for t in our_tables),
    }
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    filt = next((a for a in sys.argv[1:] if not a.startswith("--")), None)
    rows = []
    for spath in sorted(glob.glob(os.path.join(SILVER_DIR, "*.json"))):
        slug = os.path.basename(spath)[:-5]
        if filt and filt not in slug:
            continue
        ref = json.load(open(spath))
        raw = load_bronze_text(slug)
        if raw is None:
            continue  # bronze not shipped (stripped large blobs)
        route = used_process_route(ref)
        src = (ref.get("metadata") or {}).get("sourceFile") or f"{slug}.pdf"
        try:
            ours = build_ours(raw, slug, src, route)
        except Exception as e:  # noqa: BLE001
            rows.append({"slug": slug, "error": f"{type(e).__name__}: {e}"})
            print(f"[FAIL] {slug}: {type(e).__name__}: {e}")
            continue
        sc = score(ours, ref)
        f1s = {c: round(sc[c]["f1"], 4) for c, _ in CATEGORIES if sc[c]["goldCount"] or sc[c]["extractedCount"]}
        min_f1 = min(f1s.values()) if f1s else 1.0
        pat_match = sc["cost_tables"]["ref_patterns"] == sc["cost_tables"]["ours_patterns"]
        rows.append({"slug": slug, "route": "process" if route else "batch",
                     "f1": f1s, "min_f1": min_f1, "tables_match": pat_match,
                     "tables": (sc["cost_tables"]["ours_n"], sc["cost_tables"]["ref_n"])})
        flag = "OK " if min_f1 >= 0.9 else "LOW"
        print(f"[{flag}] {slug} ({rows[-1]['route']}): f1={f1s} tables "
              f"{sc['cost_tables']['ours_n']}/{sc['cost_tables']['ref_n']}"
              f"{' patterns-eq' if pat_match else ''}")
    scored = [r for r in rows if "min_f1" in r]
    summary = {
        "silver_docs_scored": len(scored),
        "all_categories_f1_ge_0.9": sum(1 for r in scored if r["min_f1"] >= 0.9),
        "all_categories_f1_eq_1.0": sum(1 for r in scored if r["min_f1"] >= 0.99999),
        "mean_min_f1": round(sum(r["min_f1"] for r in scored) / len(scored), 4) if scored else None,
        "cost_table_pattern_sets_equal": sum(1 for r in scored if r["tables_match"]),
        "errors": sum(1 for r in rows if "error" in r),
    }
    print(json.dumps(summary))
    if "--write-report" in sys.argv:
        _write(rows, summary)


def _write(rows, summary) -> None:
    lines = [
        "# PARITY_SILVER — entity parity vs the reference's shipped silver corpus",
        "",
        "Our sectionizers + report builder re-run over the reference's own",
        "bronze corpus, scored against its shipped silver with its own",
        "P/R/F1 scheme (normalized-string sets, threshold 0.9 —",
        "`backend/validation/evaluate.js:22-44`).",
        "",
        "| metric | value |",
        "| --- | --- |",
    ]
    lines += [f"| {k} | {v} |" for k, v in summary.items()]
    lines += [
        "",
        "Known divergences, adjudicated:",
        "",
        "- `bear-lake-9-key-elelment-plan-2018-2` (the only sub-0.9 doc): the",
        "  reference's E8 raw-text fallback is a filesystem read of the bronze",
        "  file that silently no-ops when missing (reportBuilder.js:896-901);",
        "  on that collision upload it failed, shipping the truncated conf-0.05",
        "  goal. Our rows always carry raw_text, so we produce the correct",
        "  conf-0.95 E8 goal — the divergence is the reference's own",
        "  path-dependent no-op (SURVEY §7 pins our semantics).",
        "- `bear-creek-2007` / `bell-creek-2012` cost-table pattern sets: the",
        "  shipped silver predates the reference's pattern-registry expansion",
        "  (tables are all `adaptive_generic_costs` injected by enrichment",
        "  passes 2-3); our run reflects the CURRENT registry, which the",
        "  reference's own snapshot fixtures pin. Entity F1 is 1.0 on both.",
        "",
        "| slug | route | min F1 | per-category F1 | cost tables (ours/ref) | pattern sets |",
              "| --- | --- | --- | --- | --- | --- |"]
    for r in rows:
        if "error" in r:
            lines.append(f"| {r['slug']} | — | ERROR | {r['error'][:60]} | — | — |")
        else:
            lines.append(
                f"| {r['slug']} | {r['route']} | {r['min_f1']} | {r['f1']} | "
                f"{r['tables'][0]}/{r['tables'][1]} | {'equal' if r['tables_match'] else 'diff'} |"
            )
    lines.append("")
    with open(REPORT, "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
