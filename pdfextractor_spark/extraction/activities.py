"""Activity extraction (E3) and 1-line-per-entity parsers (E4).

Refs: backend/services/enhancedExtractors.js:568-586,
backend/services/reportBuilder.js:18-37.
"""

from __future__ import annotations

import re

from .goals import join_wrapped_lines
from .rules import COST_RE, FREQUENCY, RESPONSIBLE_RE, VERB_ACTIVITY, YEAR_G
from .textutil import infer_audience, normalize_value

__all__ = ["extract_activities", "parse_monitoring", "parse_outreach", "parse_geography"]


def extract_activities(raw_lines: list[str]) -> list[dict]:
    lines = join_wrapped_lines(raw_lines)
    acts: list[dict] = []
    for line in lines:
        original = line
        text = line.strip()
        if not VERB_ACTIVITY.search(text):
            continue  # needs action verb
        verb_m = VERB_ACTIVITY.search(text)
        verb = verb_m.group(1).lower() if verb_m else None
        freq_m = FREQUENCY.search(text)
        freq = freq_m.group(0) if freq_m else None
        years = [m.group(1) for m in YEAR_G.finditer(text)]
        due_year = years[-1] if years else None
        resp_m = RESPONSIBLE_RE.search(text)
        responsible = resp_m.group(2).strip() if resp_m else None
        cost_m = COST_RE.search(text)
        cost_value = cost_unit = None
        if cost_m:
            cost_value = normalize_value(cost_m.group(1))
            cost_unit = "USD"
        # Object phrase: the reference builds RegExp('^'+verb+'\s+') from a
        # plain JS string, where '\s' collapses to 's' — i.e. /^installs+/i.
        # Preserved verbatim (it is a no-op for most lines).
        obj = re.sub(rf"^{verb}s+", "", text, flags=re.I) if verb else text
        s = 0.0
        if verb:
            s += 0.25
        if freq:
            s += 0.15
        if due_year:
            s += 0.15
        if responsible:
            s += 0.15
        if cost_value is not None:
            s += 0.15
        if verb and re.search(r"monitor|sample", verb, re.I):
            s += 0.05
        acts.append(
            {
                "id": f"A{len(acts) + 1}",
                "description": text,
                "verb": verb,
                "object": obj,
                "frequency": freq,
                "dueYear": due_year,
                "responsible": responsible,
                "costValue": cost_value,
                "costUnit": cost_unit,
                "confidence": min(0.95, s),
                "source": original,
            }
        )
    return acts


def parse_monitoring(lines: list[str] | None = None) -> list[dict]:
    return [
        {"id": f"M{i + 1}", "metric": line.strip(), "value": None, "unit": None, "source": line}
        for i, line in enumerate(lines or [])
    ]


def parse_outreach(lines: list[str] | None = None) -> list[dict]:
    return [
        {"id": f"O{i + 1}", "activity": line.strip(), "audience": infer_audience(line), "source": line}
        for i, line in enumerate(lines or [])
    ]


def parse_geography(lines: list[str] | None = None) -> list[dict]:
    return [
        {"id": f"GA{i + 1}", "area": line.strip(), "source": line} for i, line in enumerate(lines or [])
    ]
