"""Scalar string/numeric function library.

Semantics match the reference rule-set (reference citations in docstrings refer
to files under /root/reference). These run as plain Python inside Arrow-batched
UDFs — vectorization is across documents, not within one document.
"""

from __future__ import annotations

import re

def split_newlines(s: str) -> list[str]:
    """C-speed twin of ``re.split(r"\\r?\\n", s)``.

    ``\\r?\\n`` consumes a ``\\r`` only when it immediately precedes the
    ``\\n`` separator, so splitting on ``\\n`` and dropping one trailing
    ``\\r`` from every piece except the last is exact; lone ``\\r`` stays
    inside its piece. Property-pinned vs the regex in
    tests/test_properties.py::test_split_newlines_equivalent.
    """
    parts = s.split("\n")
    if "\r" not in s:
        return parts
    last = len(parts) - 1
    return [p[:-1] if i != last and p.endswith("\r") else p for i, p in enumerate(parts)]


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

# Precompiled module-level patterns (identical semantics to the inline
# literals they replace; these functions run per-entity inside the fused
# extraction UDF, and ``re.sub(str, ...)`` pays a compile-cache dict lookup
# per call).
_RX_DIGIT_COMMA = re.compile(r"\d,")
_RX_MOJI_DQ = re.compile(r"[\u201c\u201d]")
_RX_MOJI_A = re.compile(r"\u00e2\u20ac\u0153|\u00e2")
_RX_MOJI_B = re.compile(r"\u00e2\u20ac")
_RX_MOJI_C = re.compile(r"\u0393\u00c7\u00a3|\u0393\u00c7\u00a5")
_RX_MOJI_D = re.compile(r"\u0393\u00c7\u00d6|\u00e2\u20ac\u2122")
_RX_MOJI_E = re.compile(r"\u00e2\u20ac\u201c|\u00e2\u20ac\u201d|\u0393\u00c7\u00f4")
_RX_WS_PLUS = re.compile(r"\s+")
_RX_DEHYPHEN = re.compile(r"([A-Za-z])-(\s+)([a-z])")
_RX_SLUG_NONALNUM = re.compile(r"[^a-z0-9]+")
_RX_SLUG_DASHES = re.compile(r"-{2,}")
_RX_AUD_COMMUNITY = re.compile(r"public|community", re.I)
_RX_AUD_SCHOOL = re.compile(r"school|student", re.I)
_RX_CANON_TRAILPUNCT = re.compile(r"[,:;]+$")
_RX_CANON_FEET = re.compile(r"\((feet|ft)\)")
_RX_CANON_SIMPLE = re.compile(r"^[a-z0-9 \-()\/]{4,}$")
_RX_EVAL_KEEP = re.compile(r"[^a-z0-9% ]+")
_RX_SENT_END_WS = re.compile(r"[.!?]\s*$")
_RX_QUOTE_LOWER_START = re.compile(r'^"[a-z]')
_RX_DANGLING_INF = re.compile(r"\b(to|for|in order to)$", re.I)



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
    if low.endswith("k") and not _RX_DIGIT_COMMA.search(low):
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
    s = _RX_MOJI_DQ.sub('"', s)
    s = _RX_MOJI_A.sub('"', s)
    s = _RX_MOJI_B.sub('"', s)
    s = _RX_MOJI_C.sub('"', s)
    s = _RX_MOJI_D.sub("'", s)
    s = _RX_MOJI_E.sub("-", s)
    s = _RX_WS_PLUS.sub(" ", s)
    return s


def dehyphenate(s: str) -> str:
    """Join line-break hyphens: ``improve-\\n ment`` -> ``improvement``.

    Ref: enhancedExtractors.js:477."""
    return _RX_DEHYPHEN.sub(r"\1\3", s)


_WS_RX = re.compile(r"\s+")


def collapse_ws(s: str) -> str:
    return _WS_RX.sub(" ", s).strip()


# --- Identity / classification helpers ----------------------------------------


def slugify(name: str) -> str:
    """Lowercase, non-alnum -> '-', trim/collapse dashes, cap 80 chars.

    Ref: backend/routes/upload.js:59-63."""
    s = _RX_SLUG_NONALNUM.sub("-", name.lower())
    s = _RX_SLUG_DASHES.sub("-", s).strip("-")
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
    if _RX_AUD_COMMUNITY.search(line):
        return "Community"
    if _RX_AUD_SCHOOL.search(line):
        return "Education"
    return "General"


def canon_bmp_name(name: str) -> str:
    """Canonical BMP name for cross-report dedupe.

    Ref: backend/scripts/dedupe_bmps.js:18-31."""
    if not name:
        return ""
    n = name.lower().strip()
    n = _RX_WS_PLUS.sub(" ", n)
    n = _RX_CANON_TRAILPUNCT.sub("", n)
    n = _RX_CANON_FEET.sub("(ft)", n)
    if _RX_CANON_SIMPLE.match(n) and n.endswith("s") and len(n) > 4:
        singular = n[:-1]
        if len(singular) > 3:
            n = singular
    return n


def eval_normalize(s: str) -> str:
    """Normalization used by P/R/F1 evaluation: lowercase, keep [a-z0-9%],
    collapse whitespace. Ref: backend/validation/evaluate.js:28-31."""
    s = s.lower()
    s = _RX_EVAL_KEEP.sub(" ", s)
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
        if (_RX_SENT_END_WS.search(cur) and _RX_QUOTE_LOWER_START.match(nxt)) or _RX_DANGLING_INF.search(cur.strip()):
            parts[i] = cur + " " + nxt
            del parts[i + 1]
            continue
        i += 1
    return parts
