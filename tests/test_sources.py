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


def test_html_density_mode_numwords_rules():
    """Boilerpipe NumWordsRules (WSDM 2010): context-aware judgments the
    per-block default mode cannot make."""
    from pdfextractor_spark.sources.html import (
        extract_html_text,
        extract_html_text_density,
    )

    long_para = ("This paragraph carries more than sixteen words of real "
                 "prose so the classifier marks it as content on its own "
                 "word count alone, with room to spare.")
    short = "Short but real note."  # 4 words, 20 chars
    html = (f"<html><body><p>{long_para}</p><p>{short}</p>"
            f"<p>{long_para} again and again.</p></body></html>")
    dense = extract_html_text_density(html)
    # prev block has >4 words -> the short block survives in density mode
    assert short in dense and long_para in dense
    # the default mode's 25-char floor drops it
    assert short not in extract_html_text(html)

    # a linky block is never content in either mode; a LONG paragraph
    # (>40 words) survives even right after the nav context
    nav = "".join(f'<a href="/{k}">link {k} here</a> ' for k in range(8))
    very_long = " ".join(f"word{k} of a genuinely long paragraph"
                         for k in range(9))  # 54 words
    html2 = f"<html><body><div>{nav}</div><p>{very_long}</p></body></html>"
    dense2 = extract_html_text_density(html2)
    assert "link 3 here" not in dense2 and very_long in dense2

    # after a high-link-density neighbor, a medium block (<=40 words) with
    # no long follower is boilerplate; the same block standalone is content
    medium = ("Twenty words of prose follow the navigation block here and "
              "the tree requires more than forty to survive that context.")
    assert len(medium.split()) <= 40
    html3 = f"<html><body><p>{nav}</p><p>{medium}</p></body></html>"
    assert medium not in extract_html_text_density(html3)
    html4 = f"<html><body><p>{long_para}</p><p>{medium}</p></body></html>"
    assert medium in extract_html_text_density(html4)


def test_html_density_mode_nested_container_document_order():
    """Neighbor context is DOCUMENT order, not block-close order: a
    container's direct text (caption) is followed by the long nav list
    it introduces, so next.numWords rescues it — close order would have
    made the linky list its PREV and dropped it."""
    from pdfextractor_spark.sources.html import extract_html_text_density

    caption = "caption of ten words describing the linked chart index below"
    nav_words = " ".join(f"navitem{k}" for k in range(20))
    html = (f"<html><body><div>{caption} <ul><li>{nav_words}</li></ul></div>"
            "</body></html>")
    dense = extract_html_text_density(html)
    assert caption in dense
    # the mirror shape: caption FOLLOWS the list in the document — text
    # order must follow where the text STARTS, not where the tag opened
    html_after = (f"<html><body><div><ul><li>{nav_words}</li></ul>"
                  f"{caption} and a trailing long follower of words "
                  "extending past sixteen for the own-count rule</div>"
                  "</body></html>")
    dense_after = extract_html_text_density(html_after)
    if caption in dense_after:
        assert dense_after.index(caption) > 0 or "navitem0" not in dense_after


def test_html_density_mode_through_bronze(spark):
    from pdfextractor_spark.pipeline.bronze import extract_bronze
    from pdfextractor_spark.pipeline.schema import PAGES_SCHEMA

    long_para = ("This paragraph carries more than sixteen words of real "
                 "prose so the classifier marks it as content on its own "
                 "word count alone, with room to spare.")
    html = (f"<html><body><p>{long_para}</p><p>Short but real note.</p>"
            "</body></html>").encode()
    df = spark.createDataFrame(
        [["https://x.example/a", None, html, None, "en"]], schema=PAGES_SCHEMA)
    dense = extract_bronze(df, num_partitions=2, html_mode="density").first()
    plain = extract_bronze(df, num_partitions=2).first()
    assert "Short but real note." in dense["raw_text"]
    assert "Short but real note." not in plain["raw_text"]
    assert dense["parser"] == "html" and dense["error"] is None


def test_html_density_link_density_is_word_based():
    """The published NumWordsRules classifier defines link density as
    anchor WORDS / total words. A single long-word anchor inside real
    prose must not push the block over the 0.333 gate the way a
    char-based ratio would."""
    from pdfextractor_spark.sources.html import extract_html_text_density

    # 1 anchor word of 34 chars inside 10 words total: word density 0.1,
    # char density ~0.45 (would be dropped by a char-based gate)
    long_word = "supercalifragilisticexpialidocious"
    para = (f'Read the <a href="/x">{long_word}</a> announcement with all '
            f"of the remaining details attached here.")
    filler = ("This neighboring paragraph carries more than sixteen words "
              "of real prose so it stands as content by itself, easily.")
    html = f"<html><body><p>{filler}</p><p>{para}</p></body></html>"
    out = extract_html_text_density(html)
    assert long_word in out
    # the inverse skew: many short anchor words in few chars must still
    # be seen as linky even though their char share is modest
    nav_words = " ".join(f'<a href="/{k}">go {k}</a>' for k in range(6))
    html2 = f"<html><body><p>{filler}</p><p>{nav_words} ok</p></body></html>"
    assert "go 3" not in extract_html_text_density(html2)
