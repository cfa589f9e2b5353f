"""Property-based tests (hypothesis) for the scalar library — the functions
define byte-level parity, so they must be total (never raise) and obey the
reference's algebraic invariants on arbitrary input."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdfextractor_spark.extraction.textutil import (
    canon_bmp_name,
    canonicalize_unit,
    collapse_ws,
    eval_normalize,
    js_parse_float,
    js_round,
    js_to_locale_string,
    money_to_number,
    normalize_mojibake,
    normalize_value,
    slugify,
)

text = st.text(max_size=200)


@given(text)
@settings(max_examples=200)
def test_scalars_total_on_arbitrary_text(s):
    # none of these may raise on any input string
    money_to_number(s)
    normalize_value(s)
    js_parse_float(s)
    canonicalize_unit(s)
    normalize_mojibake(s)
    collapse_ws(s)
    slugify(s)
    canon_bmp_name(s)
    eval_normalize(s)


@given(text)
@settings(max_examples=200)
def test_slugify_idempotent_and_shape(s):
    out = slugify(s)
    assert slugify(out) == out  # idempotent
    assert len(out) <= 80
    assert out == "" or all(c.islower() or c.isdigit() or c == "-" for c in out)


@given(st.integers(min_value=0, max_value=10**12),
       st.integers(min_value=0, max_value=99))
def test_money_roundtrip(dollars, cents):
    s = f"${dollars:,}.{cents:02d}"
    # expected must be built the same way JS Number(...) parses — via the
    # decimal string — not as dollars + cents/100, whose double rounding can
    # differ in the last ulp (e.g. float("1.82") != 1 + 82/100)
    assert money_to_number(s) == float(f"{dollars}.{cents:02d}")


@given(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False))
def test_js_round_half_up_invariant(x):
    r = js_round(x)
    assert isinstance(r, int)
    assert abs(r - x) <= 0.5


@given(st.integers(min_value=0, max_value=10**15))
def test_locale_string_grouping(n):
    s = js_to_locale_string(float(n))
    assert s.replace(",", "") == str(n)
    for group in s.split(",")[1:]:
        assert len(group) == 3


@given(text)
@settings(max_examples=100)
def test_eval_normalize_idempotent(s):
    out = eval_normalize(s)
    assert eval_normalize(out) == out


@given(st.text(alphabet="abcdefghij ,.$%0123456789", min_size=0, max_size=400))
@settings(max_examples=100)
def test_extract_goals_total(s):
    # the full goal extractor must never raise on arbitrary line content
    from pdfextractor_spark.extraction.goals import extract_goals

    goals = extract_goals(s.split("\n") if s else [])
    assert isinstance(goals, list)
    for i, g in enumerate(goals):
        assert g["id"] == f"G{i+1}"


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=300)
def test_squash_ws_gate_equivalent(s):
    # the C-speed gates must be byte-equivalent to the regexes they skip
    import re as _re

    from pdfextractor_spark.extraction.goals import _norm_quotes, _squash_ws
    from pdfextractor_spark.sources.html import _squash_ws as _squash_html

    expect = _re.sub(r"\s+", " ", s)
    assert _squash_ws(s) == expect
    assert _squash_html(s) == expect
    assert _norm_quotes(s) == _re.sub(r"[‘’]", "'", _re.sub(r"[“”]", '"', s))


@given(st.text(alphabet=st.sampled_from("a\r\n \t x$"), max_size=120))
@settings(max_examples=400)
def test_split_newlines_equivalent(s):
    # the C-speed newline splitter must piece-for-piece match re.split(r"\r?\n")
    import re as _re

    from pdfextractor_spark.extraction.textutil import split_newlines

    assert split_newlines(s) == _re.split(r"\r?\n", s)


@given(st.text(max_size=200))
@settings(max_examples=300)
def test_split_newlines_equivalent_general(s):
    import re as _re

    from pdfextractor_spark.extraction.textutil import split_newlines

    assert split_newlines(s) == _re.split(r"\r?\n", s)
