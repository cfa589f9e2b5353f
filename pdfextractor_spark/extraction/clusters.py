"""Dollar-cluster discovery in reports with NO parsed cost tables.

Faithful twin of the reference's diagnostic miner (ref:
backend/scripts/discover_missing_cost_clusters.js:63-89 findClusters):
starting at any line containing ``$<digit>``, the 80-line lookahead must
hold >= 4 money lines; the cluster then expands (up to 120 lines) until
a hard section header (Goal/Objective/Section/Table N/Implementation
Plan, case-insensitive) or more than 3 consecutive non-dollar lines.
Emitted clusters carry 1-based line spans, money-line count, the first
12 lines as a sample, and the whitespace-squashed first money line
(<=120 chars) as the header signature — the signal the reference used
to discover new cost-table patterns for §2.10.
"""

from __future__ import annotations

import re

__all__ = ["find_cost_clusters"]

_MONEY = re.compile(r"\$[0-9]")
_HARD_HEADER = re.compile(
    r"^(Goal|Objective|Section|Table\s+\d+|Implementation Plan)", re.I)
_SQUASH = re.compile(r"\s+")


def find_cost_clusters(lines: list[str]) -> list[dict]:
    clusters: list[dict] = []
    i, n = 0, len(lines)
    money = _MONEY.search
    while i < n:
        if not money(lines[i] or ""):
            i += 1
            continue
        # potential start: enough dollar lines in the next 80?
        if sum(1 for l in lines[i:i + 80] if money(l or "")) < 4:
            i += 1
            continue
        end = i
        non_dollar_run = 0
        for j in range(i, min(n, i + 120)):
            line = lines[j] or ""
            if _HARD_HEADER.match(line):
                break
            if money(line):
                non_dollar_run = 0
                end = j
            else:
                non_dollar_run += 1
                if non_dollar_run > 3:
                    break
        if end > i:
            chunk = lines[i:end + 1]
            money_lines = [l for l in chunk if money(l or "")]
            sig = _SQUASH.sub(" ", money_lines[0]).strip()[:120] if money_lines else ""
            clusters.append({
                "start_line": i + 1, "end_line": end + 1,
                "money_line_count": len(money_lines),
                "sample": chunk[:12], "header_signature": sig,
            })
            i = end + 1
        else:
            i += 1
    return clusters
