#!/usr/bin/env python3
"""Real-corpus bronze parity: run our pdf-parse-compatible extractor over the
reference's shipped MDEQ PDFs and diff against the reference's own bronze
``rawText`` (produced by its actual pdf-parse pipeline — the external ground
truth the synthetic-corpus golden tests cannot provide).

Usage: python scripts_parity_mdeq.py [--write-report] [slug-filter]
"""

from __future__ import annotations

import difflib
import json
import os
import re
import sys

RAW_DIR = "/root/reference/data/raw/mdeq"
BRONZE_DIR = "/root/reference/data/bronze"
REPORT = "PARITY_MDEQ.md"


def slugify(name: str) -> str:
    """ref backend/scripts/batch_bronze_mdeq.js:18-25 / upload.js:59-63."""
    s = re.sub(r"\.pdf$", "", name, flags=re.I).lower()
    s = re.sub(r"[_\s]+", "-", s)
    s = re.sub(r"[^a-z0-9-]+", "-", s)
    s = re.sub(r"-+", "-", s)
    return s.strip("-")


def ground_truths() -> dict[str, dict]:
    """originalName -> {'text': rawText, 'pages': pageCount} (upload-route
    bronze; collision -N duplicates carry identical text)."""
    out: dict[str, dict] = {}
    for fn in sorted(os.listdir(BRONZE_DIR)):
        if not fn.endswith(".json"):
            continue
        j = json.load(open(os.path.join(BRONZE_DIR, fn)))
        md = j.get("metadata", {})
        orig = md.get("originalName")
        if not orig or not j.get("rawText"):
            continue
        if len(j["rawText"]) > len(out.get(orig, {}).get("text", "")):
            out[orig] = {"text": j["rawText"], "pages": md.get("pageCount")}
    return out


def quick_similarity(a: str, b: str) -> float:
    """Char-level similarity 2M/(|a|+|b|): line-level matching blocks first
    (fast), then char-level refinement inside each replaced block (capped) —
    full char-level SequenceMatcher on 70k-char docs takes minutes."""
    if a == b:
        return 1.0
    la, lb = a.splitlines(keepends=True), b.splitlines(keepends=True)
    sm = difflib.SequenceMatcher(None, la, lb, autojunk=False)
    matched = 0
    ai = bi = 0
    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag == "equal":
            matched += sum(len(x) for x in la[i1:i2])
        elif tag == "replace":
            sa, sb = "".join(la[i1:i2]), "".join(lb[j1:j2])
            if len(sa) + len(sb) <= 20000:
                csm = difflib.SequenceMatcher(None, sa, sb, autojunk=False)
                matched += sum(blk.size for blk in csm.get_matching_blocks())
            else:  # cap: count common char multiset as an upper-ish bound
                from collections import Counter

                ca, cb = Counter(sa), Counter(sb)
                matched += sum(min(ca[c], cb[c]) for c in ca)
    return 2.0 * matched / max(1, len(a) + len(b))


def first_diff(a: str, b: str, ctx: int = 60) -> str:
    n = min(len(a), len(b))
    i = next((k for k in range(n) if a[k] != b[k]), n)
    return (
        f"@@ first divergence at char {i} @@\n"
        f"  ours: {a[max(0, i - ctx) : i + ctx]!r}\n"
        f"  ref : {b[max(0, i - ctx) : i + ctx]!r}"
    )


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pdfextractor_spark.sources.pdfjs_text import PdfError, extract_text_pdfparse

    gt = ground_truths()
    filt = next((a for a in sys.argv[1:] if not a.startswith("--")), None)
    rows = []
    for pdf in sorted(os.listdir(RAW_DIR)):
        if not pdf.lower().endswith(".pdf"):
            continue
        if filt and filt not in slugify(pdf):
            continue
        data = open(os.path.join(RAW_DIR, pdf), "rb").read()
        row = {"pdf": pdf, "slug": slugify(pdf), "has_gt": pdf in gt}
        try:
            text, npages = extract_text_pdfparse(data)
            row["ok"] = True
            row["chars"] = len(text)
            row["pages"] = npages
        except (PdfError, Exception) as e:  # noqa: BLE001 - report all failures
            row["ok"] = False
            row["error"] = f"{type(e).__name__}: {e}"
            rows.append(row)
            print(f"[FAIL] {pdf}: {row['error']}")
            continue
        if pdf in gt:
            ref = gt[pdf]["text"]
            row["ref_chars"] = len(ref)
            row["ref_pages"] = gt[pdf]["pages"]
            row["exact"] = text == ref
            row["similarity"] = round(quick_similarity(text, ref), 6)
            marker = "BYTE-EQ" if row["exact"] else f"sim={row['similarity']}"
            print(f"[{marker}] {pdf}: ours={len(text)}ch/{npages}p ref={len(ref)}ch/{gt[pdf]['pages']}p")
            if not row["exact"] and "--diff" in sys.argv:
                print(first_diff(text, ref))
        else:
            print(f"[no-gt ] {pdf}: {len(text)} chars, {npages} pages")
        rows.append(row)

    with_gt = [r for r in rows if r.get("has_gt")]
    ok_gt = [r for r in with_gt if r.get("ok")]
    exact = sum(1 for r in ok_gt if r.get("exact"))
    sims = [r["similarity"] for r in ok_gt if "similarity" in r]
    summary = {
        "docs_total": len(rows),
        "parsed_ok": sum(1 for r in rows if r.get("ok")),
        "with_ground_truth": len(with_gt),
        "byte_exact": exact,
        "mean_similarity": round(sum(sims) / len(sims), 6) if sims else None,
        "min_similarity": round(min(sims), 6) if sims else None,
    }
    print(json.dumps(summary))
    if "--write-report" in sys.argv:
        _write_report(rows, summary)


def _write_report(rows, summary) -> None:
    lines = [
        "# PARITY_MDEQ — bronze text parity vs the reference's real corpus",
        "",
        "Our `extract_text_pdfparse` (pdf-parse@1.1.1 / pdf.js v1.10.100",
        "semantics, reimplemented from the published PDF 1.7 model) run over",
        f"`{RAW_DIR}` and diffed against the reference's own shipped bronze",
        f"`rawText` in `{BRONZE_DIR}` (upload-route output of its actual",
        "pdf-parse pipeline).",
        "",
        "| metric | value |",
        "| --- | --- |",
    ]
    lines += [f"| {k} | {v} |" for k, v in summary.items()]
    lines += ["", "| pdf | parsed | ground truth | result |", "| --- | --- | --- | --- |"]
    for r in rows:
        if not r.get("ok"):
            res = f"FAIL: {r.get('error', '?')[:80]}"
        elif r.get("exact"):
            res = "byte-identical"
        elif "similarity" in r:
            res = f"similarity {r['similarity']}"
        else:
            res = f"{r.get('chars')} chars / {r.get('pages')} pages"
        lines.append(
            f"| {r['pdf']} | {'yes' if r.get('ok') else 'no'} | "
            f"{'yes' if r.get('has_gt') else 'no'} | {res} |"
        )
    lines.append("")
    with open(REPORT, "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
