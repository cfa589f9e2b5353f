"""Regex catalog drift guards (JS RegExp -> Python re port).

Pins observed match/no-match behavior INCLUDING JS quirks we must keep
(e.g. `(%|percent)\\b` cannot match `40% ` because % followed by space has
no word boundary — true in both JS and Python)."""

from pdfextractor_spark.extraction.rules import (
    BASELINE_TARGET_PAIR,
    BMP_PATTERNS,
    DEADLINE_YEAR,
    FREQUENCY,
    LOAD_REDUCTION,
    PERCENT_RE,
    POLLUTANT_TERMS,
    QUANTITY_UNIT,
    REDUCTION_INLINE,
    RESPONSIBLE_RE,
    VERB_ACTIVITY,
)


def test_pollutant_terms():
    assert POLLUTANT_TERMS.search("reduce sediment load").group(1) == "sediment"
    assert POLLUTANT_TERMS.search("E. coli counts").group(1) == "E. coli"
    assert POLLUTANT_TERMS.search("dissolved oxygen improved") is not None
    assert POLLUTANT_TERMS.search("nothing here") is None


def test_percent_re_word_boundary_quirk():
    # `40%` followed by space/period: no word boundary after '%', no match —
    # the reference has the same dead spot (enhancedExtractors.js:6).
    assert PERCENT_RE.search("reduce sediment by 40% in the watershed") is None
    assert PERCENT_RE.search("reduce sediment by 40 percent overall") is not None
    m = PERCENT_RE.search("lower turbidity 25 percent this year")
    assert m.group(3) == "25"


def test_reduction_inline():
    m = REDUCTION_INLINE.search("achieve a 20% reduction of sediment")
    assert m.group(1) == "20"
    assert REDUCTION_INLINE.search("20% improvement") is None


def test_baseline_target_pair():
    m = BASELINE_TARGET_PAIR.search("from 45 mg/L to 30 mg/L by 2027")
    assert (m.group(1), m.group(2), m.group(3), m.group(4)) == ("45", "mg/L", "30", "mg/L")
    m2 = BASELINE_TARGET_PAIR.search("80 ppm to 40 ppm")
    assert m2.group(3) == "40"


def test_load_reduction():
    m = LOAD_REDUCTION.search("remove 1,200 lbs/yr of phosphorus")
    assert m.group(2) == "1,200"
    assert m.group(3) == "lbs"


def test_deadline_year():
    assert DEADLINE_YEAR.search("complete by 2027.").group(1) == "2027"
    assert DEADLINE_YEAR.search("in 1999") is None


def test_responsible():
    m = RESPONSIBLE_RE.search("Responsible: MDEQ.")
    assert m.group(2).strip() == "MDEQ"


def test_quantity_unit():
    m = QUANTITY_UNIT.search("along 2,500 feet of streambank")
    assert (m.group(1), m.group(2)) == ("2,500", "feet")


def test_verb_and_frequency():
    assert VERB_ACTIVITY.search("Monitor water quality").group(1) == "Monitor"
    assert FREQUENCY.search("sampling quarterly").group(1) == "quarterly"


def test_bmp_patterns_first_match_wins():
    # ordered catalog: 'riparian buffer' hits Vegetative Buffer before others
    line = "Install riparian buffer and fencing"
    for rx, cat in BMP_PATTERNS:
        if rx.search(line):
            assert cat == "Vegetative Buffer"
            break
    else:
        raise AssertionError("no BMP pattern matched")
