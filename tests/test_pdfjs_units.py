"""Unit tests for the pdf-parse-compatible parser internals (the real-corpus
parity suite covers them end to end; these pin the pieces in isolation)."""

import zlib

from pdfextractor_spark.sources.pdfjs_text import (
    Lexer,
    Name,
    PdfDocument,
    Ref,
    _apply_png_predictor,
    _lzw_decode,
    glyph_name_to_unicode,
    iter_operations,
    parse_tounicode,
    render_page_text,
)


def test_lexer_object_zoo():
    lx = Lexer(b"<< /Type /Page /Len 42 /F 3.5 /S (a\\)b) /H <48656c6C6f> "
               b"/A [1 2 R 3 null true] /N /With#20Space >>")
    d = lx.parse_object()
    assert d["Type"] == Name("Page")
    assert d["Len"] == 42 and d["F"] == 3.5
    assert d["S"] == b"a)b"
    assert d["H"] == b"Hello"
    assert d["A"] == [Ref(1, 2), 3, None, True]
    assert d["N"] == "With Space"


def test_literal_string_escapes_and_nesting():
    lx = Lexer(rb"(line\nnext \(nested\) \101 octal (deep) tail)")
    s = lx.parse_object()
    assert s == b"line\nnext (nested) A octal (deep) tail"
    # CR and CRLF normalize to LF per spec
    assert Lexer(b"(a\r\nb\rc)").parse_object() == b"a\nb\nc"


def _lzw_encode(data: bytes) -> bytes:
    """Reference TIFF-style LZW encoder (early-change, 9-12 bit codes) for
    round-tripping the decoder."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    code_len = 9
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code):
        nonlocal buf, nbits
        buf = (buf << code_len) | code
        nbits += code_len
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)

    emit(256)  # clear
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        # early change: widen one code before the table actually needs it
        if next_code + 1 > (1 << code_len) and code_len < 12:
            code_len += 1
        if next_code >= 4095:
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            code_len = 9
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(257)  # EOD
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_roundtrip():
    import random

    rng = random.Random(7)
    for payload in (
        bytes([45] * 5 + [65] * 3 + [66] * 3),
        b"abcabcabcabc" * 50,
        bytes(rng.randrange(256) for _ in range(5000)),
        b"",
    ):
        assert _lzw_decode(_lzw_encode(payload)) == payload


def test_png_predictor_up_and_sub():
    # 2 rows x 3 cols: row1 Up over implicit zero row, row2 Sub
    raw = bytes([2, 1, 1, 1, 1, 5, 0, 0])
    out = _apply_png_predictor(raw, colors=1, bpc=8, columns=3)
    assert list(out) == [1, 1, 1, 5, 5, 5]
    # row2 Up accumulates over row1
    out2 = _apply_png_predictor(bytes([2, 1, 1, 1, 2, 5, 0, 0]), 1, 8, 3)
    assert list(out2) == [1, 1, 1, 6, 1, 1]


def test_tounicode_bfchar_and_ranges():
    cmap = b"""
    beginbfchar
    <0003> <0020>
    <0041> <00410042>
    endbfchar
    beginbfrange
    <0010> <0012> <0061>
    <0020> <0021> [<0058> <0059>]
    endbfrange
    """
    m = parse_tounicode(cmap)
    assert m[3] == " " and m[0x41] == "AB"
    assert m[0x10] == "a" and m[0x12] == "c"
    assert m[0x20] == "X" and m[0x21] == "Y"


def test_glyph_names():
    assert glyph_name_to_unicode("quotedblleft") == "“"
    assert glyph_name_to_unicode("uni0041") == "A"
    assert glyph_name_to_unicode("g123") is None


def test_iter_operations_numbers_and_inline_image():
    ops = list(iter_operations(b"1 0 0 -1 10.5 .5 Tm BI /W 2 ID \x00\xff garbage EI 7 Tj"))
    assert ops[0] == ("Tm", [1, 0, 0, -1, 10.5, 0.5])
    assert ops[1][0] == "Tj" and ops[1][1] == [7]  # BI..EI skipped entirely


def test_render_page_lasty_falsy_quirk():
    # pdf-parse: `!lastY` is true when the previous y was 0 — no newline
    items = [("a", 10.0), ("b", 0.0), ("c", 5.0)]
    assert render_page_text(items) == "a\nbc"


def test_document_with_indirect_length_and_brute_recovery():
    # stream /Length as an indirect ref; xref offsets deliberately bogus ->
    # brute-force "N 0 obj" scan must recover the document
    content = b"BT /F1 12 Tf 10 700 Td (Hi) Tj ET"
    comp = zlib.compress(content)
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F1 6 0 R >> >> >>\nendobj\n"
        b"4 0 obj\n<< /Length 5 0 R /Filter /FlateDecode >>\nstream\n"
        + comp + b"\nendstream\nendobj\n"
        b"5 0 obj\n" + str(len(comp)).encode() + b"\nendobj\n"
        b"6 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
        b"trailer\n<< /Size 7 /Root 1 0 R >>\n"
        b"startxref\n999999\n%%EOF\n"
    )
    from pdfextractor_spark.sources.pdfjs_text import extract_text_pdfparse

    text, n = extract_text_pdfparse(body)
    assert n == 1 and "Hi" in text
