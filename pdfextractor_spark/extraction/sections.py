"""Sectionizers: split raw document text into named section line-buckets.

Two modes, matching the reference:
- ``extract_sections`` — exact-header stateful scan
  (ref: backend/services/sectionExtractor.js:4-24)
- ``naive_sectionize`` — per-line keyword predicates, used for the batch corpus
  (ref: backend/scripts/batch_silver_mdeq.js:59-71)
"""

from __future__ import annotations

import re

from .textutil import split_newlines

SECTION_HEADERS = ["Goals", "BMPs", "Implementation", "Monitoring", "Outreach", "Geography"]

_HEADER_RES = [(h, re.compile(rf"^{h}[:]?$", re.I)) for h in SECTION_HEADERS]
# ^Header:?$ with re.I over an ASCII line is exact equality of the
# lowercased line (sans optional trailing ':') — a dict probe instead of
# up to six anchored regex matches per document line. Non-ASCII lines
# take the regex path so sre's Unicode case-folding rules stay authoritative.
_HEADER_BY_LOWER = {h.lower(): h for h in SECTION_HEADERS}


def empty_sections(extra_activities: bool = False) -> dict[str, list[str]]:
    d = {h: [] for h in SECTION_HEADERS}
    if extra_activities:
        d["Activities"] = []
    d["uncategorized"] = []
    return d


def extract_sections(raw_text: str) -> dict[str, list[str]]:
    """Stateful scan: an exact header line switches the current bucket;
    non-empty lines append to the current section; default 'uncategorized'."""
    lines = [l.strip() for l in split_newlines(raw_text)]
    current = "uncategorized"
    sections = empty_sections()
    for line in lines:
        if not line:
            continue
        if line.isascii():
            if len(line) <= 15:  # longest header + ':' is 15 chars
                key = line.lower()
                matched = _HEADER_BY_LOWER.get(key[:-1] if key.endswith(":") else key)
            else:
                matched = None  # no header can match a longer line
        else:
            matched = None
            for name, rx in _HEADER_RES:
                if rx.match(line):
                    matched = name
                    break
        if matched is not None:
            current = matched
            continue
        sections[current].append(line)
    return sections


_GOAL_WORD = re.compile(r"\bgoal\b", re.I)
_COST_LINE = re.compile(
    r"\$[0-9]|Practice\s+Units|Code\s+Practice|BMP Cost|Estimated Units|Estimated Cost"
    r"|Unit Cost|Total Cost|Practice\s+Producer\s+NRCS\s+(EPA-?MDEQ|EPA\s*MDEQ)\s+Total",
    re.I,
)
_PROJECTED_COSTS = re.compile(r"Projected\s+Costs.*Practice.*Producer.*NRCS", re.I)


def naive_sectionize(raw_text: str) -> dict[str, list[str]]:
    """Batch-path sectionizer: 'goal' token -> Goals (cap 50); $-amount /
    cost-table header tokens -> BMPs; else uncategorized. A line can land in
    both Goals and BMPs (matches the reference's non-exclusive first check)."""
    lines = split_newlines(raw_text)
    sections = empty_sections(extra_activities=True)
    for l in lines:
        t = l.strip()
        if not t:
            continue
        bucketed = False
        if _GOAL_WORD.search(t) and len(sections["Goals"]) < 50:
            sections["Goals"].append(t)
            bucketed = True
        if _COST_LINE.search(t):
            sections["BMPs"].append(t)
            bucketed = True
        elif _PROJECTED_COSTS.search(t):
            sections["BMPs"].append(t)
            bucketed = True
        if not bucketed:
            sections["uncategorized"].append(t)
    return sections
