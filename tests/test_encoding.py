"""WHATWG encoding sniffing (sources/encoding.py).

Cases track the published algorithm: BOM precedence, the 1024-byte meta
prescan (charset attr, http-equiv content, quoting forms, UTF-16-in-meta
-> UTF-8, x-user-defined -> windows-1252), the label table folds
(latin1 -> windows-1252, gb2312 -> GBK, tis-620 -> windows-874), the
strict-UTF-8-then-windows-1252 fallback, the whatwg1252 error handler for
the five cp1252 holes, and the replacement/x-user-defined encodings.
"""

from __future__ import annotations

from pdfextractor_spark.sources.encoding import (
    label_to_codec,
    sniff_decode,
    sniff_encoding,
)


def _page(head_html: str, body: str = "", codec: str = "utf-8") -> bytes:
    return f"<html><head>{head_html}</head><body><p>{body}</p></body>".encode(codec)


def test_bom_trumps_meta():
    payload = b"\xef\xbb\xbf" + _page('<meta charset="shift_jis">')
    py, canon, how = sniff_encoding(payload)
    assert (canon, how) == ("utf-8", "bom")
    text, enc = sniff_decode(b"\xef\xbb\xbfcaf\xc3\xa9")
    assert text == "café" and enc == "utf-8"  # BOM stripped


def test_utf16_boms():
    assert sniff_encoding(b"\xfe\xff\x00a")[1] == "utf-16be"
    assert sniff_encoding(b"\xff\xfea\x00")[1] == "utf-16le"
    # the BOM is consumed by detection, never emitted in the text
    assert sniff_decode(b"\xff\xfea\x00b\x00") == ("ab", "utf-16le")
    assert sniff_decode(b"\xfe\xff\x00a\x00b") == ("ab", "utf-16be")


def test_meta_charset_quoting_forms():
    for html in (
        '<meta charset="windows-1251">',
        "<meta charset='windows-1251'>",
        "<meta charset=windows-1251>",
        "<meta CHARSET=WINDOWS-1251 >",
        '<meta foo="bar" charset="windows-1251" x=y>',
    ):
        py, canon, how = sniff_encoding(_page(html))
        assert (canon, how) == ("windows-1251", "meta"), html


def test_meta_http_equiv_content():
    html = ('<meta http-equiv="Content-Type" '
            'content="text/html; charset=shift_jis">')
    py, canon, how = sniff_encoding(_page(html))
    assert (py, canon, how) == ("cp932", "shift_jis", "meta")
    # http-equiv with a different value must NOT trigger
    other = '<meta http-equiv="refresh" content="1; url=x?charset=koi8-r">'
    assert sniff_encoding(_page(other))[2] == "utf-8"


def test_first_recognized_meta_wins():
    html = '<meta charset="bogus-enc"><meta charset="koi8-r">'
    assert sniff_encoding(_page(html))[1] == "koi8-r"


def test_prescan_limited_to_1024_bytes():
    pad = "<!-- " + "x" * 1100 + " -->"
    payload = _page(pad + '<meta charset="koi8-r">')
    assert sniff_encoding(payload)[2] == "utf-8"  # meta is past the window


def test_utf16_label_in_meta_means_utf8():
    assert sniff_encoding(_page('<meta charset="utf-16">'))[1] == "utf-8"
    assert sniff_encoding(_page('<meta charset="UTF-16BE">'))[1] == "utf-8"


def test_x_user_defined_in_meta_means_1252():
    assert sniff_encoding(_page('<meta charset="x-user-defined">'))[1] == \
        "windows-1252"


def test_label_table_folds():
    assert label_to_codec("latin1") == ("cp1252", "windows-1252")
    assert label_to_codec("ISO-8859-1") == ("cp1252", "windows-1252")
    assert label_to_codec("ascii") == ("cp1252", "windows-1252")
    assert label_to_codec("gb2312") == ("gbk", "gbk")
    assert label_to_codec("tis-620") == ("cp874", "windows-874")
    assert label_to_codec("iso-8859-9") == ("cp1254", "windows-1254")
    assert label_to_codec("iso-8859-8-i") == ("iso8859-8", "iso-8859-8-i")
    assert label_to_codec("  Shift-JIS \t") == ("cp932", "shift_jis")
    assert label_to_codec("no-such-enc") is None
    assert label_to_codec(None) is None
    assert label_to_codec(b"\xff\xfe") is None


def test_sjis_page_decodes_correctly():
    body = "日本語"  # 日本語
    payload = _page('<meta charset="shift_jis">', body, codec="shift_jis")
    text, enc = sniff_decode(payload)
    assert enc == "shift_jis" and body in text


def test_fallback_utf8_strict_then_1252():
    # pure ASCII and valid UTF-8 stay utf-8 (byte-identical legacy behavior)
    assert sniff_decode(b"<p>hello caf\xc3\xa9</p>") == \
        ("<p>hello café</p>", "utf-8")
    # invalid UTF-8 (0xE9 alone) -> windows-1252, NOT U+FFFD
    text, enc = sniff_decode(b"<p>caf\xe9 \x93quoted\x94</p>")
    assert enc == "windows-1252"
    assert "café" in text and "“quoted”" in text
    assert "�" not in text


def test_whatwg1252_holes_decode_as_c1():
    # 0x81 0x8D 0x8F 0x90 0x9D: python cp1252 raises, WHATWG passes through
    text, enc = sniff_decode(b"a\x81b\x9dc\xe9")
    assert enc == "windows-1252"
    assert text == "a\x81b\x9dcé"


def test_replacement_encoding():
    text, enc = sniff_decode(_page('<meta charset="hz-gb-2312">', "secret"))
    assert enc == "replacement" and text == "�"


def test_gbk_meta_page():
    body = "中文"  # 中文
    payload = _page('<meta charset="gb2312">', body, codec="gbk")
    text, enc = sniff_decode(payload)
    assert enc == "gbk" and body in text


def test_prescan_skips_comments():
    # a commented-out legacy meta must not hijack the decode
    html = ('<!-- <meta charset="shift_jis"> -->'
            '<meta charset="utf-8">')
    assert sniff_encoding(_page(html))[1] == "utf-8"
    # unterminated comment swallows the rest of the prescan window
    html2 = '<!-- open comment <meta charset="koi8-r">'
    assert sniff_encoding(_page(html2))[2] == "utf-8"
    # comments BETWEEN metas don't break the scan
    html3 = '<!-- x --><meta charset="koi8-r">'
    assert sniff_encoding(_page(html3))[1] == "koi8-r"
    # degenerate comments <!--> and <!---> are COMPLETE per the spec
    # (closing dashes may overlap the opener) — they must not swallow
    # the following meta
    # comment removal must not SPLICE a meta together out of fragments
    spliced = b'<met<!-- x -->a charset="koi8-r"><html>'
    assert sniff_encoding(spliced)[2] != "meta"
    for degen in ("<!-->", "<!--->"):
        assert sniff_encoding(_page(degen + '<meta charset="koi8-r">'))[1] \
            == "koi8-r", degen


def test_cjk_windows_superset_codecs():
    """WHATWG mandates the windows supersets: euc-kr IS windows-949,
    shift_jis IS windows-31j, big5 includes HKSCS."""
    # 똠 (U+B620) is a UHC extension outside narrow euc_kr
    krow = "똠방각하".encode("cp949")
    text, enc = sniff_decode(b"<p>" + krow + b"</p>",
                             "text/html; charset=euc-kr")
    assert enc == "euc-kr" and "똠방각하" in text and "�" not in text
    # ① (U+2460) lives in cp932's NEC row, outside narrow shift_jis
    jrow = "①項目".encode("cp932")
    text, enc = sniff_decode(b"<p>" + jrow + b"</p>",
                             "text/html; charset=shift_jis")
    assert enc == "shift_jis" and "①項目" in text and "�" not in text
    assert label_to_codec("big5-hkscs") == ("big5hkscs", "big5")


def test_transport_layer_precedence():
    from pdfextractor_spark.sources.encoding import charset_from_content_type

    # header parsing forms
    assert charset_from_content_type("text/html; charset=Shift_JIS") == "Shift_JIS"
    assert charset_from_content_type('text/html; charset="koi8-r"') == "koi8-r"
    assert charset_from_content_type("text/html") is None
    assert charset_from_content_type(None) is None
    # BOM still beats transport
    payload = b"\xef\xbb\xbfcaf\xc3\xa9"
    assert sniff_encoding(payload, "text/html; charset=shift_jis")[2] == "bom"
    # transport beats meta
    page = _page('<meta charset="koi8-r">')
    py, canon, how = sniff_encoding(page, "text/html; charset=windows-1251")
    assert (canon, how) == ("windows-1251", "transport")
    # unknown transport label falls through to meta
    py, canon, how = sniff_encoding(page, "text/html; charset=bogus")
    assert (canon, how) == ("koi8-r", "meta")
    # transport label decodes the payload
    body = "Предмет и цель"
    raw = f"<p>{body} plus enough prose to matter</p>".encode("cp1251")
    text, enc = sniff_decode(raw, "text/html; charset=windows-1251")
    assert enc == "windows-1251" and body in text


def test_warc_content_type_reaches_bronze(spark, tmp_path):
    """read_warc(keep_content_type=True) carries the HTTP charset hint and
    the bronze stage decodes a meta-less legacy page with it."""
    from pdfextractor_spark.pipeline.bronze import extract_bronze
    from pdfextractor_spark.sources.warc import make_warc, read_warc

    body_text = "Résumé façade café prose long enough to pass the gate."
    html = (f"<html><head><title>t</title></head><body><p>{body_text}"
            "</p></body></html>").encode("cp1252")
    warc = make_warc([{
        "url": "https://example.org/legacy", "date": "2024-01-01T00:00:00Z",
        "body": html, "http_content_type": "text/html; charset=windows-1252",
    }])
    p = tmp_path / "a.warc"
    p.write_bytes(warc)
    pages = read_warc(spark, str(p), keep_content_type=True)
    assert "content_type" in pages.columns
    rows = extract_bronze(pages, num_partitions=2).collect()
    assert len(rows) == 1
    assert rows[0]["encoding"] == "windows-1252"
    assert body_text in rows[0]["raw_text"]
    # without the flag the schema stays the 5-column pages contract
    assert "content_type" not in read_warc(spark, str(p)).columns


def test_bronze_extract_one_uses_sniffing():
    from pdfextractor_spark.pipeline.bronze import _extract_one

    body = "café résumé and twenty more characters of prose."
    payload = ("<html><head><meta charset=windows-1252></head><body><p>"
               + body + "</p></body></html>").encode("cp1252")
    raw, parser, _n, err, enc = _extract_one(payload, None)
    assert parser == "html" and err is None and enc == "windows-1252"
    assert "café résumé" in raw
    # PDFs and passthrough rows carry no encoding
    assert _extract_one(None, "pre-extracted")[4] is None


def test_charset_mix_corpus_byte_parity(spark):
    """End-to-end: legacy-encoded pages (cp1252/Shift_JIS/GBK/EUC-KR/
    ISO-8859-7/windows-1251 with declared meta charsets) flow through the
    Spark bronze stage and the parity column stays byte-identical — the
    sniffed decode recovers the exact original string."""
    from pdfextractor_spark.corpus import PAGES_COLUMNS, generate_pages
    from pdfextractor_spark.pipeline.bronze import extract_bronze
    from pdfextractor_spark.pipeline.schema import PAGES_SCHEMA

    rows = generate_pages(120, charset_mix=True)
    df = spark.createDataFrame(
        [[r[c] for c in PAGES_COLUMNS] for r in rows], schema=PAGES_SCHEMA)
    bronze = extract_bronze(df, num_partitions=4).cache()
    try:
        got = {r["url"]: r for r in bronze.collect()}
        legacy = 0
        for r in rows:
            b = got[r["url"]]
            if r["text"] is not None:
                assert b["text_match"] is True, (r["url"], b["error"])
            if b["parser"] == "html" and b["encoding"] not in (None, "utf-8"):
                legacy += 1
        # the mix actually exercised non-UTF-8 decodes
        assert legacy >= 10
        encs = {b["encoding"] for b in got.values() if b["encoding"]}
        assert {"windows-1252", "shift_jis", "gbk"} <= encs
    finally:
        bronze.unpersist()


def test_encoding_mix_rollup(spark):
    from pdfextractor_spark.pipeline.gold import encoding_mix

    bronze = spark.createDataFrame(
        [("u1", "html", "utf-8"), ("u2", "html", "utf-8"),
         ("u3", "html", "windows-1252"), ("u4", "html", None),
         ("u5", "pdf-parse", None)],
        "url string, parser string, encoding string")
    rows = encoding_mix(bronze).collect()
    assert [(r["encoding"], r["docs"], r["share"]) for r in rows] == [
        ("utf-8", 2, 0.5), ("unknown", 1, 0.25), ("windows-1252", 1, 0.25)]
    plan = encoding_mix(bronze)._jdf.queryExecution().executedPlan().toString()
    assert "WindowExec" not in plan  # share comes from a broadcast total


def test_sniff_decode_never_raises_on_garbage():
    import random

    rng = random.Random(7)
    for _ in range(200):
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(80)))
        text, enc = sniff_decode(payload)
        assert isinstance(text, str) and isinstance(enc, str)


def test_extract_bronze_rejects_unknown_html_mode(spark):
    import pytest

    from pdfextractor_spark.pipeline.bronze import extract_bronze
    from pdfextractor_spark.pipeline.schema import PAGES_SCHEMA

    df = spark.createDataFrame([], schema=PAGES_SCHEMA)
    with pytest.raises(ValueError, match="html_mode"):
        extract_bronze(df, html_mode="denisty")


def test_every_label_in_table_decodes_garbage_safely():
    """Property sweep: EVERY label in the WHATWG table yields a usable
    decode path — random byte payloads with that meta decode to str
    without raising, and sniffing reports the canonical name."""
    import random

    from pdfextractor_spark.sources.encoding import _LABELS

    rng = random.Random(99)
    seen_canon = set()
    for label, (py, canon) in sorted(_LABELS.items()):
        payload = (f'<html><head><meta charset="{label}"></head><body>'
                   .encode("ascii")
                   + bytes(rng.randrange(256) for _ in range(64)))
        text, enc = sniff_decode(payload)
        assert isinstance(text, str), label
        # utf-16 labels in meta rewrite to utf-8; x-user-defined to 1252
        expect = ("utf-8" if canon in ("utf-16le", "utf-16be")
                  else "windows-1252" if canon == "x-user-defined"
                  else canon)
        assert enc == expect, (label, enc)
        seen_canon.add(canon)
    # the table actually spans the WHATWG encoding set
    assert len(seen_canon) >= 35


def test_strip_comments_fuzz_never_breaks_prescan():
    import random

    rng = random.Random(5)
    pieces = ["<!--", "-->", "<!-->", "<!--->", "x", ">", "<", "-",
              '<meta charset="koi8-r">', "<!-- c -->"]
    for _ in range(300):
        blob = "".join(rng.choice(pieces)
                       for _ in range(rng.randrange(12))).encode()
        got = sniff_encoding(blob)  # must never raise
        assert got[1] in ("utf-8", "koi8-r", "windows-1252")


def test_meta_tag_scan_is_quote_aware():
    """A '>' inside a quoted attribute value must not truncate the meta
    tag before the charset is seen (the WHATWG prescan's attribute
    scanner is quote-aware)."""
    from pdfextractor_spark.sources.encoding import sniff_encoding

    page = (b'<html><head>'
            b'<meta content="text/html; a>b; charset=shift_jis" '
            b'http-equiv="content-type"></head><body>x</body></html>')
    codec, canon, how = sniff_encoding(page)
    assert (canon, how) == ("shift_jis", "meta")
    # reversed attribute order, single quotes, '>' inside the value
    page2 = (b"<html><head><meta http-equiv='content-type' "
             b"content='text/html; x>y; charset=euc-kr'></head>")
    assert sniff_encoding(page2)[1] == "euc-kr"
    # an unquoted tag still terminates at the first '>'
    page3 = b'<meta charset=cp1251><body>'
    assert sniff_encoding(page3)[1] == "windows-1251"


def test_prescan_attribute_scanner_edge_cases():
    """Second-review regressions: the prescan's attribute loop must
    (a) never honor a meta embedded in a QUOTED value of an earlier
    tag, (b) treat '=' and quotes inside an unquoted value as literal,
    and (c) not accept vertical tab as tag-name whitespace."""
    from pdfextractor_spark.sources.encoding import _prescan_meta

    # (a) the embedded "tag" is markup TEXT inside a value
    got = _prescan_meta(
        b'<meta name=d content="<meta charset=shift_jis>">'
        b'<meta charset=utf-8>')
    assert got == ("utf-8", "utf-8")
    # (b) '=' then a quote inside an unquoted value: the quote is a
    # value char, and the real charset after it is still found
    assert _prescan_meta(b'<meta x=y=" charset=utf-8>') == \
        ("utf-8", "utf-8")
    # apostrophe in an unquoted value stays literal
    assert _prescan_meta(b"<meta content=don't charset=euc-kr>") == \
        ("cp949", "euc-kr")
    # (c) 0x0b is not prescan whitespace: the tag is not a meta
    assert _prescan_meta(b"<meta\x0bcharset=shift_jis>") is None
    # an unterminated quote ends the window: a LATER meta outside any
    # tag is still unreachable (the value swallows it), matching the
    # spec's give-up-at-window-end behavior
    assert _prescan_meta(b'<meta content="never closes '
                         b'<meta charset=shift_jis>') is None


def test_prescan_scanner_fuzz_terminates_and_sniff_total():
    """The attribute-loop tag scanner (round-5 rewrite) must terminate
    and sniff_decode must stay TOTAL (returns text, never raises) on
    arbitrary byte soup — deterministic LCG fuzz like the comment-
    prescan gate above, seeded for reproducibility."""
    import random

    from pdfextractor_spark.sources.encoding import (
        _meta_tag_end,
        _prescan_meta,
        sniff_decode,
    )

    rng = random.Random(0xC0FFEE)
    alphabet = b"<>=\"' \t\n\x0b\x0cmetacharsut-/;ABC\x00\xff\x80"
    for _ in range(400):
        n = rng.randrange(0, 300)
        data = bytes(rng.choice(alphabet) for _ in range(n))
        out = _prescan_meta(data)
        assert out is None or isinstance(out, tuple)
        text, enc = sniff_decode(data)
        assert isinstance(text, str) and isinstance(enc, str)
        # the scanner itself on arbitrary offsets: returns int, no hang
        if n:
            e = _meta_tag_end(data, rng.randrange(0, n))
            assert isinstance(e, int)
