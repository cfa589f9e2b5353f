"""Scalar string/numeric function library.

Semantics match the reference rule-set (reference citations in docstrings refer
to files under /root/reference). These run as plain Python inside Arrow-batched
UDFs — vectorization is across documents, not within one document.
"""

from __future__ import annotations

import re

# --- JS-compatible numeric parsing -------------------------------------------

_FLOAT_PREFIX = re.compile(r"^[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")


def js_parse_float(s) -> float | None:
    """Mimic JS ``parseFloat``: parse the longest leading float prefix.

    Returns None where JS returns NaN.
    """
    if s is None:
        return None
    m = _FLOAT_PREFIX.match(str(s).strip())
    return float(m.group(0)) if m else None


def js_round(x: float) -> int:
    """JS ``Math.round``: half-up toward +Infinity (not banker's rounding)."""
    import math

    return int(math.floor(x + 0.5))


_MONEY_RE = re.compile(r"\$?([0-9][0-9,]*(?:\.[0-9]{2})?)")


def money_to_number(s) -> float | None:
    """``$1,234.56`` -> 1234.56 (first match, comma strip).

    Ref: backend/services/patterns/costTablePatterns.js:5-6.
    """
    if not s:
        return None
    m = _MONEY_RE.search(str(s))
    if not m:
        return None
    v = js_parse_float(m.group(1).replace(",", ""))
    return v


def normalize_value(s) -> float | None:
    """``"12k"`` -> 12000.0; comma-strip parseFloat otherwise.

    Ref: backend/services/enhancedExtractors.js:38-43.
    """
    if not s:
        return None
    low = str(s).lower()
    if low.endswith("k") and not re.search(r"\d,", low):
        base = js_parse_float(low.replace("k", ""))
        return base * 1000 if base is not None else None
    return js_parse_float(low.replace(",", ""))


def js_to_locale_string(v: float) -> str:
    """Approximate JS ``Number.toLocaleString('en-US')`` for money sums:
    comma thousands grouping; up to 3 fractional digits, no trailing zeros."""
    if v == int(v):
        return f"{int(v):,}"
    s = f"{v:,.3f}".rstrip("0").rstrip(".")
    return s


# --- Unit canonicalization ----------------------------------------------------

# Minimal map used by the pattern registry (costTablePatterns.js:9)
_UNIT_MAP_PATTERNS = {
    "each": "each", "ea": "each", "ac": "acre", "acre": "acre", "acres": "acre",
    "ft": "ft", "feet": "ft", "cuyd": "cu_yd", "cy": "cu_yd", "sqft": "sq_ft",
    "gal": "gal", "no": "each",
}

# Fuller map used by the legacy builder paths (reportBuilder.js:585)
_UNIT_MAP_FULL = {
    "each": "each", "ea": "each", "ac": "acre", "acre": "acre", "acres": "acre",
    "ft": "ft", "feet": "ft", "foot": "ft", "lf": "linear_ft", "linft": "linear_ft",
    "linear": "linear_ft", "linearft": "linear_ft", "sqft": "sq_ft", "sq.ft": "sq_ft",
    "sq": "sq_ft", "sq_ft": "sq_ft", "sq.ft.": "sq_ft", "yd": "yd", "yds": "yd",
    "cuyd": "cu_yd", "cy": "cu_yd", "cu.yd": "cu_yd", "gal": "gal", "gals": "gal",
    "gallon": "gal", "gallons": "gal", "mgd": "mgd", "mg/l": "mg_per_l", "tpy": "tpy",
}

_NON_ALNUM = re.compile(r"[^a-z0-9_]")


def canonicalize_unit(u, full: bool = False) -> str | None:
    """Unit token canonicalization; fallback strips non-alnum.

    Ref: costTablePatterns.js:9 (minimal) / reportBuilder.js:582-587 (full).
    """
    if not u:
        return None
    raw = str(u).lower()
    if raw.endswith("."):
        raw = raw[:-1]
    table = _UNIT_MAP_FULL if full else _UNIT_MAP_PATTERNS
    return table.get(raw, _NON_ALNUM.sub("", raw))


# --- Encoding / whitespace normalization --------------------------------------


def normalize_mojibake(s: str) -> str:
    """Smart-quote/mojibake normalization + whitespace collapse.

    Ref: enhancedExtractors.js:105-112 (order preserved: the broad ``â€œ|â``
    alternation runs before the narrower ``â€`` replacement).
    """
    s = re.sub(r"[“”]", '"', s)
    s = re.sub(r"â€œ|â", '"', s)
    s = re.sub(r"â€", '"', s)
    s = re.sub(r"ΓÇ£|ΓÇ¥", '"', s)
    s = re.sub(r"ΓÇÖ|â€™", "'", s)
    s = re.sub(r"â€“|â€”|ΓÇô", "-", s)
    s = re.sub(r"\s+", " ", s)
    return s


def dehyphenate(s: str) -> str:
    """Join line-break hyphens: ``improve-\\n ment`` -> ``improvement``.

    Ref: enhancedExtractors.js:477."""
    return re.sub(r"([A-Za-z])-(\s+)([a-z])", r"\1\3", s)


_WS_RX = re.compile(r"\s+")


def collapse_ws(s: str) -> str:
    return _WS_RX.sub(" ", s).strip()


# --- Identity / classification helpers ----------------------------------------


def slugify(name: str) -> str:
    """Lowercase, non-alnum -> '-', trim/collapse dashes, cap 80 chars.

    Ref: backend/routes/upload.js:59-63."""
    s = re.sub(r"[^a-z0-9]+", "-", name.lower())
    s = re.sub(r"-{2,}", "-", s).strip("-")
    return s[:80]


_STATUS_DONE = re.compile(r"completed|achieved|done|met\b", re.I)
_STATUS_ONGOING = re.compile(r"in progress|ongoing|underway", re.I)
_STATUS_NOT_STARTED = re.compile(r"not (?:started|begun)", re.I)


def infer_status(line: str) -> str:
    """completed / in_progress / planned keyword ladder.

    Ref: enhancedExtractors.js:588-594."""
    if _STATUS_DONE.search(line):
        return "completed"
    if _STATUS_ONGOING.search(line):
        return "in_progress"
    if _STATUS_NOT_STARTED.search(line):
        return "planned"
    return "planned"


def infer_audience(line: str) -> str:
    """Ref: reportBuilder.js:12-16."""
    if re.search(r"public|community", line, re.I):
        return "Community"
    if re.search(r"school|student", line, re.I):
        return "Education"
    return "General"


def canon_bmp_name(name: str) -> str:
    """Canonical BMP name for cross-report dedupe.

    Ref: backend/scripts/dedupe_bmps.js:18-31."""
    if not name:
        return ""
    n = name.lower().strip()
    n = re.sub(r"\s+", " ", n)
    n = re.sub(r"[,:;]+$", "", n)
    n = re.sub(r"\((feet|ft)\)", "(ft)", n)
    if re.match(r"^[a-z0-9 \-()\/]{4,}$", n) and n.endswith("s") and len(n) > 4:
        singular = n[:-1]
        if len(singular) > 3:
            n = singular
    return n


def eval_normalize(s: str) -> str:
    """Normalization used by P/R/F1 evaluation: lowercase, keep [a-z0-9%],
    collapse whitespace. Ref: backend/validation/evaluate.js:28-31."""
    s = s.lower()
    s = re.sub(r"[^a-z0-9% ]+", " ", s)
    return collapse_ws(s)


# --- Sentence segmentation ----------------------------------------------------

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def split_sentences(s: str) -> list[str]:
    """``split(/(?<=[.!?])\\s+/)`` with the reference's re-join rules applied by
    callers (dangling ``to|for|in order to`` and ``."`` + lowercase)."""
    return [p for p in _SENT_SPLIT.split(s) if p]


def rejoin_sentence_parts(parts: list[str]) -> list[str]:
    """Merge prematurely-split sentence parts (quote continuations and
    dangling infinitive markers). Ref: enhancedExtractors.js:239-248,353-358."""
    parts = list(parts)
    i = 0
    while i < len(parts) - 1:
        cur, nxt = parts[i], parts[i + 1]
        # The two rules are mutually exclusive (a part cannot end both with
        # [.!?] and with a bare infinitive marker), so check order is moot;
        # after a merge we stay at index i (JS ``si--; continue``).
        if (re.search(r"[.!?]\s*$", cur) and re.match(r'^"[a-z]', nxt)) or re.search(
            r"\b(to|for|in order to)$", cur.strip(), re.I
        ):
            parts[i] = cur + " " + nxt
            del parts[i + 1]
            continue
        i += 1
    return parts
