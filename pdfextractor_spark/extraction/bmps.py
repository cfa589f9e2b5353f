"""BMP extraction (E2), heuristic BMP filter (P3), category refinement (E5),
and name cleanup (stripCostTail).

Refs: backend/services/enhancedExtractors.js:552-566,
backend/services/bmpFilters.js, backend/services/reportBuilder.js:736-757,1062-1085.
"""

from __future__ import annotations

import re

_RX_YEAR4 = re.compile(r"\d{4}")
_RX_MAINT = re.compile(r"maintenance|maintain", re.I)
_RX_WS = re.compile(r"\s+")
_RX_DIGIT = re.compile(r"\d")
_RX_TRAIL_PUNCT = re.compile(r"[,:;]+$")

from .goals import join_wrapped_lines
from .rules import BMP_PATTERNS, QUANTITY_UNIT, VERB_ACTIVITY
from .textutil import js_parse_float

__all__ = ["extract_bmps", "filter_bmps", "categorize_bmp_name", "strip_cost_tail"]


def extract_bmps(raw_lines: list[str]) -> list[dict]:
    lines = join_wrapped_lines(raw_lines)
    bmps: list[dict] = []
    for line in lines:
        original = line
        text = line.strip()
        category = "General"
        matched_term = None
        for rx, cat in BMP_PATTERNS:
            m = rx.search(text)
            if m:
                category = cat
                matched_term = m.group(0)
                break
        qty = QUANTITY_UNIT.search(text)
        quantity = unit = None
        if qty:
            quantity = js_parse_float(qty.group(1).replace(",", ""))
            unit = qty.group(2)
        verb_m = VERB_ACTIVITY.search(text)
        verb = verb_m.group(1).lower() if verb_m else None
        s = 0.0
        if matched_term:
            s += 0.3
        if quantity is not None:
            s += 0.25
        if verb:
            s += 0.15
        if category != "General":
            s += 0.1
        if _RX_YEAR4.search(text):
            s += 0.05
        if _RX_MAINT.search(text):
            s += 0.05
        bmps.append(
            {
                "id": f"B{len(bmps) + 1}",
                "name": text,
                "category": category,
                "keyword": matched_term,
                "quantity": quantity,
                "unit": unit,
                "verb": verb,
                "confidence": min(0.95, s),
                "source": original,
            }
        )
    return bmps


# --- P3 heuristic filter (bmpFilters.js) ---------------------------------------

_ACTION_KEYWORDS = re.compile(
    r"(install|construct|stabilize|restore|plant|exclude|fence|retrofit|diversion|sediment"
    r"|basin|buffer|pond|weir|seeding|tillage|cover crop|nutrient management|wetland|bioswale"
    r"|rain garden|grassed waterway|filter strip|critical area planting|manager|implementation|monitor)",
    re.I,
)
_START_DISCARD = re.compile(
    r"^(total( estimated)? cost|budget|the budget|september|october|november|december|january"
    r"|february|march|april|may|june|july|august|q[1-4]\b|\d{1,2}/\d{1,2}/\d{2,4})",
    re.I,
)
_COST_ONLY = re.compile(r"^(total|amount|estimated cost|cost estimate|total estimated cost)$", re.I)
_SCHEDULE_FRAGMENT = re.compile(r"months? \d+\s*-\s*\d+$", re.I)
_PHASE_TOKEN = re.compile(r"\b(phase|year)\s*\d{1,2}\b", re.I)
_TIME_RANGE = re.compile(r"\b(20\d{2}\s*-\s*20\d{2})\b")
_PERCENT_TOKEN = re.compile(r"\b\d{1,3}%\b")
_VERBISH = re.compile(
    r"(install|construct|stabilize|plant|exclude|fence|retrofit|implement|upgrade|repair|replace)", re.I
)
_COST_WORD = re.compile(r"\b(cost|budget|amount|estimated|dollars?)\b", re.I)
_NON_ALPHA = re.compile(r"[a-z]", re.I)
_RETENTION_TERMS = re.compile(
    r"\b(fencing|structure|stabilization|planting|weir|basin|buffer|wetland|diversion|waterway|seeding)\b",
    re.I,
)

_REASON_ORDER = [
    ("startsBad", "starts_bad_token"),
    ("scheduleFragment", "schedule_fragment"),
    ("costContext", "cost_context"),
    ("numericPunctHeavy", "numeric_punct_heavy"),
    ("tooShort", "too_short"),
    ("tooLong", "too_long"),
    ("looksHeader", "header_case"),
    ("phaseToken", "phase_token"),
    ("timeRange", "time_range"),
    ("metaOnly", "meta_only"),
    ("metricsOnly", "metrics_only"),
]

_REJECT_SCORES = {
    "startsBad": 2.5,
    "costContext": 2.0,
    "scheduleFragment": 1.5,
    "numericPunctHeavy": 1.2,
    "looksHeader": 1.2,
    "tooShort": 1.5,
    "tooLong": 1.0,
    "phaseToken": 0.8,
    "timeRange": 0.8,
    "metaOnly": 0.7,
    "metricsOnly": 0.7,
}


def filter_bmps(bmps: list[dict]) -> tuple[list[dict], list[dict]]:
    """Non-destructive split into (filtered, rejected) with reasons + scores."""
    filtered: list[dict] = []
    rejected: list[dict] = []
    for b in bmps:
        name_raw = (b.get("name") or "").strip()
        lower = name_raw.lower()
        tokens = [t for t in _RX_WS.split(lower) if t]
        token_count = len(tokens)
        action_like = bool(_ACTION_KEYWORDS.search(lower)) or bool(_VERBISH.search(lower))
        non_alpha_len = len(_NON_ALPHA.sub("", name_raw))
        flags = {
            "startsBad": bool(_START_DISCARD.search(lower)),
            "scheduleFragment": bool(_SCHEDULE_FRAGMENT.search(lower)),
            "costContext": bool(_COST_ONLY.search(lower)) or (bool(_COST_WORD.search(lower)) and not action_like),
            "numericPunctHeavy": (non_alpha_len / max(1, len(name_raw))) > 0.65,
            "tooShort": token_count < 2,
            "tooLong": token_count > 30 and not action_like,
            "looksHeader": bool(re.match(r"^[A-Z ]{6,}$", name_raw)) and not action_like,
            "phaseToken": bool(_PHASE_TOKEN.search(lower)),
            "timeRange": bool(_TIME_RANGE.search(lower)),
            "percentToken": bool(_PERCENT_TOKEN.search(lower)),
        }
        flags["metaOnly"] = (flags["phaseToken"] or flags["timeRange"]) and not action_like and token_count < 8
        flags["metricsOnly"] = flags["percentToken"] and not action_like and token_count < 6
        reject = any(flags.values()) and not action_like and not (flags["percentToken"] and action_like)
        if reject:
            reasons = [name for key, name in _REASON_ORDER if flags[key]] or ["generic"]
            score = sum(v for k, v in _REJECT_SCORES.items() if flags[k])
            if action_like:
                score -= 1.0
            confidence = round(max(0.0, min(10.0, score)), 2)
            rejected.append(
                {
                    **b,
                    "rejectReasons": reasons,
                    "rejectPrimary": reasons[0],
                    "rejectFlags": flags,
                    "confidence": confidence,
                }
            )
        else:
            score = 3.0
            if action_like:
                score += 3.0
            if 3 <= token_count <= 14:
                score += 2.0
            if _RETENTION_TERMS.search(name_raw):
                score += 1.5
            filtered.append({**b, "filterConfidence": round(max(0.0, min(10.0, score)), 2)})
    return filtered, rejected


def categorize_bmp_name(name: str) -> str | None:
    """Ordered specific-category remap (ref: reportBuilder.js:1062-1077).

    NOTE: in the reference this refinement runs on a BMP list that is later
    discarded (finalizeReport re-extracts), so it never affects output; we
    expose it as a standalone utility."""
    n = (name or "").lower()
    if re.search(r"cover\s+crops?", n):
        return "Cover Crops"
    if re.search(r"grassed\s+waterway", n):
        return "Erosion Control"
    if re.search(r"sediment basin|sedimentation basin|grade stabilization|terraces?|diversions?", n):
        return "Structural Erosion"
    if re.search(r"pond\b|stormwater pond|detention|retention", n):
        return "Stormwater"
    if re.search(r"streambank|shoreline|bank stabilization|riprap|revetment", n):
        return "Streambank Stabilization"
    if re.search(r"heavy use area protection|livestock|tank/trough|trough|watering facility", n):
        return "Livestock Management"
    if re.search(r"fencing", n):
        return "Fencing"
    if re.search(r"forage.*biomass planting|biomass planting|forage planting", n):
        return "Forage & Biomass"
    if re.search(r"aquatic|fisheries? management|fish habitat", n):
        return "Aquatic Habitat"
    if re.search(r"invasive|noxious", n):
        return "Invasive Species"
    if re.search(r"ag\s*bmp|agric|agriculture", n):
        return "Agriculture"
    return None


_COST_TAIL = re.compile(
    r"^(.*?)(?:\s+\d[\d,]*(?:\.[0-9]+)?\s*(?:ac|acre|acres|ft|feet|ea|es|lf|yd|yds|cy|cuyd"
    r"|sq\.?ft\.?|ac\.|ft\.|ea\.)\b.*|\s+@\s*\$|\s+\$[0-9])",
    re.I,
)


def strip_cost_tail(name: str) -> str:
    """Strip trailing qty/unit/@$ fragments leaked from cost tables into BMP
    names (ref: reportBuilder.js:736-746)."""
    if not name:
        return name
    # C-speed gate: "[$@]" is a 2-char class (substring tests) and \d stays
    # a precompiled pattern so unicode-digit semantics are unchanged
    if "$" not in name and "@" not in name and not _RX_DIGIT.search(name):
        return name
    m = _COST_TAIL.match(name)
    if m and m.group(1):
        cleaned = _RX_TRAIL_PUNCT.sub("", m.group(1).strip()).strip()
        if cleaned and len(cleaned) >= 2:
            return cleaned
    return name
