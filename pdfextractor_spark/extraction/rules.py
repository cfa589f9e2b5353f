"""Shared regex rule constants for entity extraction.

Ported one-for-one from the reference catalogs
(ref: backend/services/enhancedExtractors.js:5-36). Every regex here is
golden-tested in tests/test_rules.py (JS->Python regex drift guard).
"""

from __future__ import annotations

import re

POLLUTANT_TERMS = re.compile(
    r"(nitrogen|phosphorus|phosphate|nitrate|nitrite|ammonia|ammonium|sediment|tss"
    r"|turbidity|bacteria|e\.?\s?coli|fecal coliform|coliform|ph|dissolved oxygen"
    r"|temperature|metals?|zinc|copper|lead|mercury|chlorophyll|algae)",
    re.I,
)
PERCENT_RE = re.compile(
    r"(reduce|decrease|lower|cut)\s+(.*?)(?:by\s+)?(\d{1,3}(?:\.\d+)?)\s?(%|percent)\b", re.I
)
REDUCTION_INLINE = re.compile(r"(\d{1,3}(?:\.\d+)?)\s?(%|percent)\s+(reduction|decrease)", re.I)
BASELINE_TARGET_PAIR = re.compile(
    r"(\d{1,4}(?:,[0-9]{3})?(?:\.[0-9]+)?)\s?(mg/L|mg\\L|ppm|%|tons?|lbs|pounds|acres?|kg)"
    r"\s+(?:to|->|➡|versus|vs)\s+"
    r"(\d{1,4}(?:,[0-9]{3})?(?:\.[0-9]+)?)\s?(mg/L|mg\\L|ppm|%|tons?|lbs|pounds|acres?|kg)",
    re.I,
)
LOAD_REDUCTION = re.compile(
    r"(reduce|remove|eliminate)\s+(\d{1,4}(?:,[0-9]{3})?(?:\.[0-9]+)?)\s?(lbs|pounds|tons?|kg)/?(yr|year|per year)?",
    re.I,
)
DEADLINE_YEAR = re.compile(r"by\s+(20\d{2})", re.I)
YEAR_G = re.compile(r"(20\d{2})")
RESPONSIBLE_RE = re.compile(r"(responsible|lead|agency|partner|coordinator|managed by)[:\-]\s*([^;,.]+)", re.I)
COST_RE = re.compile(r"\$\s?([0-9]{1,3}(?:,[0-9]{3})*(?:\.[0-9]+)?|[0-9]+k)\b", re.I)

# BMP terms & categories (first match wins; order preserved)
BMP_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(r"(riparian|stream) buffer|riparian corridor", re.I), "Vegetative Buffer"),
    (re.compile(r"cover crop", re.I), "Vegetative"),
    (re.compile(r"grassed waterway", re.I), "Erosion Control"),
    (re.compile(r"nutrient management", re.I), "Nutrient Management"),
    (re.compile(r"conservation tillage|no[- ]till", re.I), "Tillage"),
    (re.compile(r"livestock exclusion|fencing", re.I), "Livestock Exclusion"),
    (re.compile(r"streambank stabilization|bank stabilization", re.I), "Erosion Control"),
    (re.compile(r"wetland restoration|constructed wetland", re.I), "Wetland"),
    (re.compile(r"sediment basin|detention basin|retention basin", re.I), "Structural"),
    (re.compile(r"rain garden|bioswale|infiltration (?:trench|basin)", re.I), "Infiltration"),
    (re.compile(r"filter strip", re.I), "Filter Strip"),
    (re.compile(r"stormwater pond", re.I), "Stormwater"),
    (re.compile(r"culvert", re.I), "Hydrologic"),
    (re.compile(r"drainage improvement|drainage system", re.I), "Hydrologic"),
]

QUANTITY_UNIT = re.compile(
    r"(\d{1,4}(?:,[0-9]{3})?(?:\.[0-9]+)?)\s?(acres?|ft|feet|feet of|linear feet|lbs|pounds|tons?|kg|mg/L|mg\\L|ppm|%)",
    re.I,
)
VERB_ACTIVITY = re.compile(
    r"\b(install|construct|monitor|sample|educate|conduct|train|survey|upgrade|implement"
    r"|maintain|restore|stabilize|plant|fence|exclude|retrofit)\b",
    re.I,
)
FREQUENCY = re.compile(
    r"(annually|quarterly|monthly|weekly|daily|each\s+(?:spring|summer|fall|winter)|every\s+year)", re.I
)
ACHIEVED_RE = re.compile(
    r"(current|achieved|existing)[:\s]+(\d{1,4}(?:,[0-9]{3})?(?:\.[0-9]+)?)"
    r"(\s?(mg/L|mg\\L|ppm|%|tons?|lbs|pounds|kg))?",
    re.I,
)
