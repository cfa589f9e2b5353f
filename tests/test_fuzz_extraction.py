"""Adversarial-corpus fuzz gates (pure python, no SparkSession).

At 10^12 documents the pages table WILL contain every malformed byte
sequence there is; the per-row contract is: extraction returns a value
or an error STRING, it never raises past the row boundary, and the HTML
fast tokenizer is event-equivalent to the stdlib parser on EVERY input
(the fallback guarantee in sources/html.py). These were spot-verified
with ad-hoc fuzz sweeps in round 3 — this module pins them as standing
hypothesis properties so a future tokenizer edit can't silently diverge.
"""

from unittest import mock

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdfextractor_spark.pipeline.bronze import _extract_one
from pdfextractor_spark.pipeline.silver import build_report_row
from pdfextractor_spark.sources import html as html_mod

# fragments biased toward tag-machinery edge cases: tolerant/bogus tags,
# rawtext close probes, entities, comments, doctypes, PIs, bare '<'
_FRAGMENTS = st.sampled_from([
    "<p>", "</p>", "<div>", "</div>", "<div id=a class='b c'>",
    "<script>", "</script>", "</scriptx>", "</script foo>", "<style>",
    "</style>", "<br/>", "<a href=\"x\">", "</a>", "<!--", "-->",
    "<!-- unterminated", "<!doctype html>", "<![CDATA[", "]]>", "<?php ?>",
    "<?", "<!", "</", "<", ">", "< p>", "<p", "=\"", "'", "&amp;", "&#65;",
    "&#x41;", "&bogus;", "&", ";", "words and more words. ", "Line\n",
    " ", "\t", "$1,234.56 ", "Goal: reduce runoff. ",
])
_SOUP = st.text(alphabet="<>&;/!?-='\"abp \n\t", max_size=60)
_HTMLISH = st.lists(_FRAGMENTS | _SOUP, max_size=30).map("".join)


def _stdlib_only_extract(markup: str) -> str:
    with mock.patch.object(html_mod, "_fast_feed",
                           side_effect=html_mod._FastUnsupported):
        return html_mod.extract_html_text(markup)


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_HTMLISH)
def test_fast_tokenizer_event_equivalent_to_stdlib(markup):
    assert html_mod.extract_html_text(markup) == _stdlib_only_extract(markup)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400),
       st.sampled_from([b"", b"%PDF-", b"%PDF-1.4\n", b"<html>", b"\x89PNG"]))
def test_extract_one_never_raises(payload, prefix):
    raw, parser, n_pages, err, _enc = _extract_one(prefix + payload, None)
    assert parser in ("pdf-parse", "pdfjs", "html", "passthrough", "error")
    assert raw is not None or err is not None


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.text(alphabet="abcdefgh \n.$%:0123456789-()/&#GoalBMPCost", max_size=600))
def test_build_report_row_never_raises(text):
    row = build_report_row("http://fuzz.example/doc", "en", text)
    assert row["url"] == "http://fuzz.example/doc"
    assert isinstance(row["total_goals"], int) and row["total_goals"] >= 0


def test_extract_one_survives_structured_pdf_mutations():
    """Bit-flipped REAL PDFs (not random bytes) reach deep parser states —
    xref/stream/filter/content machinery — and must still come back as a
    value or an error string, never an exception. Deterministic seeds."""
    import random

    from pdfextractor_spark.corpus import generate_pages

    pdfs = [bytes(r["html"]) for r in generate_pages(120)
            if r["html"] and bytes(r["html"])[:5] == b"%PDF-"][:12]
    assert len(pdfs) >= 8
    rng = random.Random(1234)
    checked = 0
    for payload in pdfs:
        for _ in range(25):
            mutated = bytearray(payload)
            for _ in range(rng.randint(1, 8)):
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
            raw, parser, n_pages, err, _enc = _extract_one(bytes(mutated), None)
            assert raw is not None or err is not None
            assert isinstance(err, (str, type(None)))
            checked += 1
    assert checked == len(pdfs) * 25
