"""Pass-3 aggressive cost-cluster enrichment (``aggressive_loose_cluster``).

Faithful port of the reference's third enrichment pass
(ref: backend/scripts/enrich_silver_costs_pass3.js:36-118): scans the whole
raw text for runs of >=3 consecutive ``$``-bearing lines, infers columns by
tab / 2+-space splitting, keeps rows whose LAST cell carries a dollar
amount, and guards against noise (sum < $5,000 skipped; >60% repeating
first token skipped; 40-line cap). A ``Total $X`` line within 5 lines after
the cluster becomes ``totalReported``. Confidence 0.6 when a header keyword
line sits within 3 lines above, else 0.55. Only reports with NO existing
normalized cost tables are enriched, clusters sorted by computed total
descending — all mirroring the reference exactly, including its look-ahead
window anchored at ``cluster.start + len(rows)`` (not the cluster length).
"""

from __future__ import annotations

import re

from .textutil import split_newlines

__all__ = ["scan_loose_clusters", "infer_table_from_cluster", "enrich_report_pass3"]

_MONEY_RE = re.compile(r"\$[0-9][0-9,]*(?:\.[0-9]{2})?")
_HEADER_RE = re.compile(r"(cost|estimate|budget|practice|bmp|activity|item)", re.I)


def _clean_lines(raw: str) -> list[str]:
    return [l.replace(" ", " ").strip() for l in split_newlines(raw)]


def scan_loose_clusters(raw: str) -> list[dict]:
    lines = _clean_lines(raw)
    clusters: list[dict] = []
    current: list[str] = []
    start_idx = 0

    def flush():
        nonlocal current
        if len(current) >= 3:
            clusters.append({"start": start_idx, "lines": list(current)})
        current = []

    for i, l in enumerate(lines):
        if re.search(r"\$[0-9]", l):
            if not current:
                start_idx = i
            current.append(l)
        else:
            flush()
    flush()
    return clusters


def infer_table_from_cluster(cluster: dict, all_lines: list[str]) -> dict | None:
    raw_lines = cluster["lines"][:40]
    money_vals = _MONEY_RE.findall(" ".join(raw_lines))
    if len(set(money_vals)) < 2:
        return None
    header_window = [s.strip() for s in all_lines[max(0, cluster["start"] - 3) : cluster["start"]]]
    header_line = next((h for h in reversed(header_window) if _HEADER_RE.search(h)), None)
    delim = r"\t+" if any("\t" in l for l in raw_lines) else r" {2,}"
    rows: list[dict] = []
    reported_total = None
    total_sum = 0.0
    for l in raw_lines:
        if re.match(r"^total", l, re.I):
            continue
        parts = [p.strip() for p in re.split(delim, l) if p.strip()]
        if not parts:
            continue
        money_match = _MONEY_RE.search(parts[-1])
        if not money_match:
            continue
        total_cell = money_match.group(0)
        numeric_total = float(total_cell.replace("$", "").replace(",", ""))
        total_sum += numeric_total
        rows.append({"raw": l, "columns": parts, "total": total_cell, "numericTotal": numeric_total})
    if len(rows) < 3:
        return None
    if total_sum < 5000:
        return None
    first_tokens = [(r["columns"][0] or "").lower() for r in rows]
    freq: dict[str, int] = {}
    for t in first_tokens:
        freq[t] = freq.get(t, 0) + 1
    if max(freq.values()) / len(rows) > 0.6:
        return None
    # look-ahead for an explicit total line — anchored at start+len(rows),
    # exactly as the reference does (NOT start + cluster length)
    for i in range(cluster["start"] + len(rows), min(cluster["start"] + len(rows) + 5, len(all_lines))):
        l = all_lines[i]
        if not l:
            continue
        if re.search(r"total", l, re.I) and re.search(r"\$[0-9]", l):
            m = _MONEY_RE.search(l)
            if m:
                reported_total = float(m.group(0).replace("$", "").replace(",", ""))
                break
    table_rows = []
    norm_rows = []
    for r in rows:
        name = r["columns"][0]
        size_part = " ".join(r["columns"][1:-1]) if len(r["columns"]) > 2 else ""
        table_rows.append({"Item": name, "Size/Amount": size_part, "Estimated Cost": r["total"]})
        norm_rows.append({
            "name": name, "rawSize": size_part, "rawCost": r["total"],
            "quantity": None, "unit": None, "unitRaw": None, "unitCost": None,
            "totalCost": r["numericTotal"],
        })
    if not table_rows:
        return None
    discrepancy = (reported_total - total_sum) if reported_total is not None else None
    return {
        "table": {"columns": ["Item", "Size/Amount", "Estimated Cost"],
                  "rows": table_rows, "total": reported_total},
        "normalized": {"rows": norm_rows, "totalReported": reported_total,
                       "totalComputed": total_sum, "discrepancy": discrepancy,
                       "patternId": "aggressive_loose_cluster",
                       "patternConfidence": 0.6 if header_line else 0.55},
    }


def enrich_report_pass3(report: dict, raw: str) -> dict:
    """Mutates ``report`` in place; returns {'added': bool, 'tables': int}."""
    result = {"added": False, "tables": 0}
    if report.get("bmpCostTablesNormalized"):
        return result
    all_lines = _clean_lines(raw)
    parsed = []
    for c in scan_loose_clusters(raw):
        p = infer_table_from_cluster(c, all_lines)
        if p:
            parsed.append(p)
    if not parsed:
        return result
    parsed.sort(key=lambda p: -(p["normalized"]["totalComputed"] or 0))
    report["bmpCostTables"] = (report.get("bmpCostTables") or []) + [
        {"id": f"aggressive_cluster_{i + 1}", "title": "Loose Cost Cluster",
         "table": p["table"], "patternId": p["normalized"]["patternId"],
         "patternConfidence": p["normalized"]["patternConfidence"]}
        for i, p in enumerate(parsed)
    ]
    report["bmpCostTablesNormalized"] = (report.get("bmpCostTablesNormalized") or []) + [
        {"id": f"aggressive_cluster_{i + 1}", "title": "Loose Cost Cluster", **p["normalized"]}
        for i, p in enumerate(parsed)
    ]
    if not report.get("bmpCostTable") and report["bmpCostTables"]:
        report["bmpCostTable"] = report["bmpCostTables"][0]
    if not report.get("bmpCostTableNormalized") and report["bmpCostTablesNormalized"]:
        report["bmpCostTableNormalized"] = report["bmpCostTablesNormalized"][0]
    md = report.setdefault("metadata", {})
    md["costPatternsDetected"] = (md.get("costPatternsDetected") or []) + [
        {"id": p["normalized"]["patternId"], "title": "Loose Cost Cluster",
         "confidence": p["normalized"]["patternConfidence"],
         "totalReported": p["normalized"]["totalReported"],
         "totalComputed": p["normalized"]["totalComputed"]}
        for p in parsed
    ]
    md["enrichedCostsPass3"] = True
    result["added"] = True
    result["tables"] = len(parsed)
    return result
