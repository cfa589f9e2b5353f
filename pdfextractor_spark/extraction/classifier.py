"""Deterministic rule classifier for ``uncategorized`` section lines.

Replaces the reference's optional OpenAI line classifier
(backend/services/classifier.js:9-36: key-gated gpt-4o-mini prompt mapping
each uncategorized line to one of Goals/BMPs/Implementation/Monitoring/
Outreach/Geography, then emptying uncategorized) with keyword/regex scoring
per section label, as specified by the north-star. Deterministic by
construction: fixed keyword sets, fixed tie order, no network.

Deviation from the reference (documented): the LLM labels every line and
the reference then empties ``uncategorized``; a rule scorer only moves
lines with a positive score — unmatched lines STAY uncategorized so the
downstream bronze-fallback miners (E6/E7) still see them. Like the
reference (no API key => no-op), the pass is opt-in.
"""

from __future__ import annotations

import re

__all__ = ["classify_ambiguous", "score_line"]

# Label order = reference section order; ties resolve to the earliest.
_LABEL_RULES: list[tuple[str, re.Pattern]] = [
    ("Goals", re.compile(
        r"\bgoals?\b|\bobjectives?\b|\btargets?\b|\breduc(?:e|ing|tion)\b"
        r"|\bachiev|\bimprov|\brestor|\battain", re.I)),
    ("BMPs", re.compile(
        r"\bbmps?\b|\bpractices?\b|cover crops?|buffer|waterways?|sediment basin"
        r"|\bfencing\b|grade stabilization|nutrient management|no.?till"
        r"|streambank|terrace", re.I)),
    ("Implementation", re.compile(
        r"\bimplement|\bschedule|\bphase\b|\btimeline|\binstall|\bconstruct"
        r"|\bmilestone|\bcontract", re.I)),
    ("Monitoring", re.compile(
        r"\bmonitor|\bsampl(?:e|ing)\b|\bmeasure|\bassess|water quality data"
        r"|\bgauge|\bstations?\b", re.I)),
    ("Outreach", re.compile(
        r"\boutreach\b|\beducat|\bworkshops?\b|\bpublic\b|\blandowners?\b"
        r"|\bmeetings?\b|\bnewsletters?\b|\bvolunteers?\b", re.I)),
    ("Geography", re.compile(
        r"\bwatersheds?\b|\bcount(?:y|ies)\b|\bcreeks?\b|\brivers?\b|\bbasins?\b"
        r"|\bhuc\b|\bacres?\b|\bsquare miles?\b|\btributar", re.I)),
]


def score_line(line: str) -> dict[str, int]:
    """Regex-hit count per label (a label's score = number of distinct
    keyword matches of its pattern in the line)."""
    return {label: len(rx.findall(line)) for label, rx in _LABEL_RULES}


def classify_ambiguous(sections: dict) -> dict:
    """Move each positively-scored ``uncategorized`` line to its best label
    (max score; ties -> earliest label in reference section order). Mutates
    and returns ``sections``, mirroring the reference's in-place contract."""
    uncategorized = sections.get("uncategorized") or []
    if not uncategorized:
        return sections
    remaining = []
    for line in uncategorized:
        scores = score_line(line)
        best_label, best = None, 0
        for label, _ in _LABEL_RULES:  # fixed priority order on ties
            if scores[label] > best:
                best_label, best = label, scores[label]
        if best_label is not None and best_label in sections:
            sections[best_label].append(line)
        else:
            remaining.append(line)
    sections["uncategorized"] = remaining
    return sections
