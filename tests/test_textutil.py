"""Scalar function library unit tests (JS->Python drift guards).

Each case pins the reference semantics (citations in the function
docstrings under pdfextractor_spark/extraction/textutil.py)."""

from pdfextractor_spark.extraction.textutil import (
    canon_bmp_name,
    canonicalize_unit,
    collapse_ws,
    dehyphenate,
    eval_normalize,
    infer_audience,
    infer_status,
    js_parse_float,
    js_round,
    js_to_locale_string,
    money_to_number,
    normalize_mojibake,
    normalize_value,
    rejoin_sentence_parts,
    slugify,
    split_sentences,
)


def test_js_parse_float():
    assert js_parse_float("12.5abc") == 12.5
    assert js_parse_float("  -3") == -3.0
    assert js_parse_float(".5x") == 0.5
    assert js_parse_float("abc") is None
    assert js_parse_float(None) is None


def test_js_round_half_up():
    assert js_round(0.5) == 1
    assert js_round(1.5) == 2
    assert js_round(2.5) == 3  # not banker's rounding
    assert js_round(-0.5) == 0  # JS Math.round(-0.5) === -0


def test_money_to_number():
    assert money_to_number("$1,234.56") == 1234.56
    assert money_to_number("cost is $22,350.00 total") == 22350.0
    assert money_to_number("1200") == 1200.0
    assert money_to_number("no money here") is None
    assert money_to_number("") is None


def test_normalize_value():
    assert normalize_value("12k") == 12000.0
    assert normalize_value("1,234") == 1234.0
    assert normalize_value("3.5") == 3.5
    assert normalize_value(None) is None


def test_js_to_locale_string():
    assert js_to_locale_string(81350.0) == "81,350"
    assert js_to_locale_string(69.17) == "69.17"
    assert js_to_locale_string(1234567.5) == "1,234,567.5"


def test_canonicalize_unit():
    assert canonicalize_unit("ea") == "each"
    assert canonicalize_unit("ac") == "acre"
    assert canonicalize_unit("no") == "each"
    assert canonicalize_unit("ft.") == "ft"
    assert canonicalize_unit("lf", full=True) == "linear_ft"
    assert canonicalize_unit("mg/l", full=True) == "mg_per_l"
    assert canonicalize_unit("weird$unit") == "weirdunit"  # fallback strip


def test_normalize_mojibake():
    # The chain mirrors the reference's replace order exactly, including its
    # JS quirks: [""] runs first and consumes the cp1252 third byte of
    # mojibake dashes/quotes, so the later â€“ rule can never fire
    # (ref: enhancedExtractors.js:105-112).
    assert normalize_mojibake("â€œhealthy streamsâ€") == '"healthy streams"€'
    assert normalize_mojibake("a â€“ b   c") == 'a "€" b c'
    assert normalize_mojibake("donâ€™t") == 'don"€™t'
    assert normalize_mojibake("“quoted”") == '"quoted"'
    assert normalize_mojibake("ΓÇ£xΓÇ¥") == '"x"'


def test_dehyphenate():
    assert dehyphenate("improve-\n ment") == "improvement"
    assert dehyphenate("well-known") == "well-known"  # no space, untouched


def test_slugify():
    assert slugify("Dry Creek Watershed Plan (2017)!") == "dry-creek-watershed-plan-2017"
    assert len(slugify("x" * 200)) == 80


def test_infer_status():
    assert infer_status("the goal was achieved in 2020") == "completed"
    assert infer_status("work is ongoing") == "in_progress"
    assert infer_status("not started") == "planned"
    assert infer_status("plain line") == "planned"


def test_infer_audience():
    assert infer_audience("community workshops for the public") == "Community"
    assert infer_audience("school programs for students") == "Education"
    assert infer_audience("misc") == "General"


def test_canon_bmp_name():
    assert canon_bmp_name("Sediment Basins") == "sediment basin"
    assert canon_bmp_name("  Fencing (feet):") == "fencing (ft)"
    assert canon_bmp_name("") == ""


def test_eval_normalize():
    assert eval_normalize("Reduce 25%! (TSS)") == "reduce 25% tss"


def test_sentence_split_and_rejoin():
    parts = split_sentences('First one. "lowercase quote continuation. Second.')
    joined = rejoin_sentence_parts(parts)
    assert joined[0].startswith("First one.")
    parts2 = rejoin_sentence_parts(["We want to", "improve water quality."])
    assert parts2 == ["We want to improve water quality."]


def test_collapse_ws():
    assert collapse_ws("  a \n\t b  ") == "a b"
