"""Source extractor tests: PDF content-stream parse with y-bucket/x-sort
line rebuild (S1/S2) and HTML boilerplate stripping (readability-style)."""

import pytest

from pdfextractor_spark.sources.html import extract_html_text
from pdfextractor_spark.sources.pdf import PdfParseError, extract_pdf_text, make_pdf


def test_pdf_roundtrip_simple():
    pdf = make_pdf([[(72, 750, "Hello world"), (72, 736, "Second line")]])
    text, n_pages = extract_pdf_text(pdf)
    assert n_pages == 1
    assert text == "Hello world\nSecond line\n"


def test_pdf_two_column_out_of_order_stream():
    # right column emitted FIRST in the content stream; y-bucket/x-sort must
    # still produce reading order: same y -> left column segment first
    items = [(330, 750, "RIGHT-A"), (330, 736, "RIGHT-B"),
             (72, 750, "left-a"), (72, 736, "left-b")]
    pdf = make_pdf([items])
    text, _ = extract_pdf_text(pdf)
    assert text == "left-a RIGHT-A\nleft-b RIGHT-B\n"


def test_pdf_page_break_blank_line():
    pdf = make_pdf([[(72, 750, "page one")], [(72, 750, "page two")]])
    text, n_pages = extract_pdf_text(pdf)
    assert n_pages == 2
    assert text == "page one\n\npage two\n"


def test_pdf_y_bucket_rounding():
    # y values rounding to the same integer bucket join into one line
    pdf = make_pdf([[(72, 750.3, "a"), (200, 749.8, "b"), (300, 750.49, "c")]])
    text, _ = extract_pdf_text(pdf)
    assert text.splitlines()[0] == "a b c"


def test_pdf_compressed_and_uncompressed_identical():
    items = [[(72, 750, "Some (escaped) text with \\ backslash")]]
    t1, _ = extract_pdf_text(make_pdf(items, compress=True))
    t2, _ = extract_pdf_text(make_pdf(items, compress=False))
    assert t1 == t2
    assert "(escaped)" in t1


def test_pdf_stream_containing_endobj_literal():
    # compressed bytes may contain the literal 'endobj'/'endstream' by
    # chance; /Length-based slicing must survive it (regression: doc 438)
    lines = [f"{('endobj ' * (i % 3))}filler row {i} with text" for i in range(120)]
    pdf = make_pdf([[(72, 750 - 14 * i, l) for i, l in enumerate(lines[:45])]])
    text, _ = extract_pdf_text(pdf)
    assert "filler row 0" in text


def test_pdf_corrupt_payload_raises():
    with pytest.raises(PdfParseError):
        extract_pdf_text(b"%PDF-1.4 \x00\x01corrupt")
    with pytest.raises(PdfParseError):
        extract_pdf_text(b"not a pdf at all")


HTML = """<!DOCTYPE html>
<html><head><title>T</title><style>body{margin:0}</style>
<script>var x=1;</script></head>
<body>
<nav><a href="/a">Nav A</a> <a href="/b">Nav B</a> <a href="/c">Nav C</a></nav>
<header><div>Site Header Portal</div></header>
<aside><ul><li><a href="/r/1">Related 1</a></li><li><a href="/r/2">Related 2</a></li></ul>
<div>Advertisement: call now for low rates!</div></aside>
<article>
<p>The overall goal is to reduce sediment by 20% in the watershed.</p>
<p>Install riparian buffer along 2,500 feet of streambank to filter runoff
and provide shade for the stream channel during summer months.</p>
</article>
<footer><p>Copyright 2024. All rights reserved.</p></footer>
</body></html>"""


def test_html_keeps_article_drops_boilerplate():
    text = extract_html_text(HTML)
    assert "reduce sediment by 20%" in text
    assert "riparian buffer" in text
    assert "Nav A" not in text
    assert "Advertisement" not in text
    assert "Copyright" not in text
    assert "var x=1" not in text


def test_html_deterministic():
    assert extract_html_text(HTML) == extract_html_text(HTML)
