"""WHATWG character-encoding sniffing for Common-Crawl-style ``html:binary``.

A real crawl is not UTF-8: ~5-8% of pages are windows-1252/Shift_JIS/GBK/
EUC-KR/... and a hard-coded ``decode("utf-8", errors="replace")`` mangles
every one of them into U+FFFD soup that then poisons dedup keys, language
ID and quality scores downstream. This module implements the published
WHATWG algorithm ("determining the character encoding",
https://html.spec.whatwg.org/multipage/parsing.html#determining-the-character-encoding
+ the label table of https://encoding.spec.whatwg.org/):

1. **BOM sniffing** (trumps everything): ``EF BB BF`` -> UTF-8,
   ``FE FF`` -> UTF-16BE, ``FF FE`` -> UTF-16LE.
2. **Meta prescan** of the first 1024 bytes: ``<meta charset=...>`` and
   ``<meta http-equiv="content-type" content="...charset=...">``, with the
   spec's two post-steps — a UTF-16 family label found in content means
   UTF-8, and ``x-user-defined`` in a meta means windows-1252.
3. **Fallback**: strict UTF-8 attempt (the 2020s web default — and it keeps
   every previously-correct page byte-identical), else windows-1252 with
   the WHATWG decoder's ISO-8859-1 passthrough for the five bytes Python's
   cp1252 leaves unmapped (0x81 8D 8F 90 9D -> C1 controls).

Labels map to codecs per the WHATWG table (latin1/ascii -> windows-1252,
gb2312 -> GBK, tis-620 -> windows-874, iso-8859-8-i -> iso-8859-8, ...).
The hostile-label ``replacement`` encoding decodes to a single U+FFFD as
specified; ``x-user-defined`` maps 0x80-0xFF to U+F780-U+F7FF.

Everything is deterministic pure Python — it runs inside the Arrow-batched
extraction UDF (``pipeline/bronze._extract_one``), no per-row JVM calls.
No reference counterpart (the reference ingests pre-decoded text); this is
graft-brief capability for the pages-table input shape.
"""

from __future__ import annotations

import codecs
import re

__all__ = ["sniff_decode", "sniff_encoding", "label_to_codec",
           "charset_from_content_type"]


def _whatwg1252_errors(err: UnicodeDecodeError):
    # WHATWG windows-1252 maps the five bytes Python's cp1252 rejects
    # (0x81 0x8D 0x8F 0x90 0x9D) to the same-valued C1 controls
    return ("".join(chr(b) for b in err.object[err.start:err.end]), err.end)


codecs.register_error("whatwg1252", _whatwg1252_errors)

# WHATWG label -> (python codec, canonical whatwg name). One entry per
# label in the spec's table for every encoding that appears on the web;
# exotic labels of the same encoding share a row.
_LABELS: dict[str, tuple[str, str]] = {}


def _add(py_codec: str, canonical: str, *labels: str) -> None:
    for lb in labels:
        _LABELS[lb] = (py_codec, canonical)


_add("utf-8", "utf-8", "utf-8", "utf8", "unicode-1-1-utf-8", "unicode11utf8",
     "unicode20utf8", "x-unicode20utf8")
# the spec folds all Latin-1 labels into windows-1252
_add("cp1252", "windows-1252", "windows-1252", "cp1252", "x-cp1252",
     "ansi_x3.4-1968", "ascii", "us-ascii", "cp819", "ibm819", "iso-8859-1",
     "iso8859-1", "iso88591", "iso_8859-1", "iso_8859-1:1987", "l1",
     "latin1", "csisolatin1", "iso-ir-100")
_add("cp1250", "windows-1250", "windows-1250", "cp1250", "x-cp1250")
_add("cp1251", "windows-1251", "windows-1251", "cp1251", "x-cp1251")
_add("cp1253", "windows-1253", "windows-1253", "cp1253", "x-cp1253")
# iso-8859-9 labels fold into windows-1254 per the spec
_add("cp1254", "windows-1254", "windows-1254", "cp1254", "x-cp1254",
     "iso-8859-9", "iso8859-9", "iso88599", "iso_8859-9", "iso_8859-9:1989",
     "l5", "latin5", "csisolatin5", "iso-ir-148")
_add("cp1255", "windows-1255", "windows-1255", "cp1255", "x-cp1255")
_add("cp1256", "windows-1256", "windows-1256", "cp1256", "x-cp1256")
_add("cp1257", "windows-1257", "windows-1257", "cp1257", "x-cp1257")
_add("cp1258", "windows-1258", "windows-1258", "cp1258", "x-cp1258")
_add("cp874", "windows-874", "windows-874", "dos-874", "tis-620",
     "iso-8859-11", "iso8859-11", "iso885911")
_add("iso8859-2", "iso-8859-2", "iso-8859-2", "iso8859-2", "iso88592",
     "iso_8859-2", "iso_8859-2:1987", "l2", "latin2", "csisolatin2",
     "iso-ir-101")
_add("iso8859-3", "iso-8859-3", "iso-8859-3", "iso8859-3", "iso88593",
     "iso_8859-3", "iso_8859-3:1988", "l3", "latin3", "csisolatin3",
     "iso-ir-109")
_add("iso8859-4", "iso-8859-4", "iso-8859-4", "iso8859-4", "iso88594",
     "iso_8859-4", "iso_8859-4:1988", "l4", "latin4", "csisolatin4",
     "iso-ir-110")
_add("iso8859-5", "iso-8859-5", "iso-8859-5", "iso8859-5", "iso88595",
     "iso_8859-5", "iso_8859-5:1988", "cyrillic", "csisolatincyrillic",
     "iso-ir-144")
_add("iso8859-6", "iso-8859-6", "iso-8859-6", "iso8859-6", "iso88596",
     "iso_8859-6", "iso_8859-6:1987", "arabic", "asmo-708", "csiso88596e",
     "csiso88596i", "csisolatinarabic", "ecma-114", "iso-8859-6-e",
     "iso-8859-6-i", "iso-ir-127")
_add("iso8859-7", "iso-8859-7", "iso-8859-7", "iso8859-7", "iso88597",
     "iso_8859-7", "iso_8859-7:1987", "greek", "greek8", "elot_928",
     "ecma-118", "csisolatingreek", "sun_eu_greek", "iso-ir-126")
_add("iso8859-8", "iso-8859-8", "iso-8859-8", "iso8859-8", "iso88598",
     "iso_8859-8", "iso_8859-8:1988", "hebrew", "csiso88598e",
     "csisolatinhebrew", "iso-8859-8-e", "visual", "iso-ir-138")
_add("iso8859-8", "iso-8859-8-i", "iso-8859-8-i", "csiso88598i", "logical")
_add("iso8859-10", "iso-8859-10", "iso-8859-10", "iso8859-10", "iso885910",
     "l6", "latin6", "csisolatin6", "iso-ir-157")
_add("iso8859-13", "iso-8859-13", "iso-8859-13", "iso8859-13", "iso885913")
_add("iso8859-14", "iso-8859-14", "iso-8859-14", "iso8859-14", "iso885914")
_add("iso8859-15", "iso-8859-15", "iso-8859-15", "iso8859-15", "iso885915",
     "iso_8859-15", "l9", "csisolatin9", "latin9")
_add("iso8859-16", "iso-8859-16", "iso-8859-16")
_add("koi8-r", "koi8-r", "koi8-r", "koi8", "koi", "cskoi8r", "koi8_r")
_add("koi8-u", "koi8-u", "koi8-u", "koi8-ru")
_add("mac-roman", "macintosh", "macintosh", "csmacintosh", "mac",
     "x-mac-roman")
_add("mac-cyrillic", "x-mac-cyrillic", "x-mac-cyrillic", "x-mac-ukrainian")
# gb2312 labels fold into GBK; gb18030 stays itself. The CJK decoders are
# the WHATWG-mandated WINDOWS supersets, not the narrow ISO codecs: the
# spec's shift_jis index IS windows-31j (python cp932), its euc-kr IS
# windows-949 (python cp949), and its big5 index includes the HKSCS
# extensions (python big5hkscs) — the narrow codecs turn the vendor rows
# ubiquitous on the real web (NEC (1), UHC hangul) into U+FFFD plus a
# spurious trail byte.
_add("gbk", "gbk", "gbk", "gb2312", "chinese", "csgb2312", "csiso58gb231280",
     "gb_2312", "gb_2312-80", "iso-ir-58", "x-gbk")
_add("gb18030", "gb18030", "gb18030")
_add("big5hkscs", "big5", "big5", "big5-hkscs", "cn-big5", "csbig5",
     "x-x-big5")
_add("euc_jp", "euc-jp", "euc-jp", "cseucpkdfmtjapanese", "x-euc-jp")
_add("iso2022_jp", "iso-2022-jp", "iso-2022-jp", "csiso2022jp")
_add("cp932", "shift_jis", "shift_jis", "shift-jis", "sjis", "x-sjis",
     "csshiftjis", "ms932", "ms_kanji", "windows-31j")
_add("cp949", "euc-kr", "euc-kr", "cseuckr", "csksc56011987", "iso-ir-149",
     "korean", "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601",
     "windows-949")
_add("utf-16-le", "utf-16le", "utf-16le", "utf-16", "unicodefeff",
     "csunicode", "ucs-2", "unicode", "iso-10646-ucs-2")
_add("utf-16-be", "utf-16be", "utf-16be", "unicodefffe")
# hostile labels -> the replacement encoding (decodes to one U+FFFD)
_add("_replacement", "replacement", "replacement", "csiso2022kr", "hz-gb-2312",
     "iso-2022-cn", "iso-2022-cn-ext", "iso-2022-kr")
_add("_x-user-defined", "x-user-defined", "x-user-defined")

_UTF16_FAMILY = {"utf-16le", "utf-16be"}

# ASCII whitespace per the spec's prescan tokenizer. The meta-tag START
# is found by regex; the tag END comes from _meta_tag_end, a character
# scanner that mirrors the WHATWG prescan's attribute rules: a quote
# opens a quoted value ONLY when it directly follows '=' (plus optional
# whitespace), so '>' inside such a value does not close the tag, while
# an apostrophe in the middle of an UNQUOTED value ("content=don't") is
# a literal character — a quote-alternation regex gets exactly that
# case wrong (the lone quote either fails the tag or swallows past its
# '>' into the next one).
# explicit whitespace class, NOT \s: Python's bytes \s includes vertical
# tab 0x0b, which WHATWG prescan whitespace excludes
_META_START_RE = re.compile(rb"<meta(?=[ \t\n\r\x0c/>])", re.IGNORECASE)
_WS = b" \t\n\r\x0c"
_ATTR_RE = re.compile(
    rb"""([a-zA-Z0-9_:.-]+)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?""",
)
_CONTENT_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*("[^"]*"|'[^']*'|[^\s;"']*)""", re.IGNORECASE)


def label_to_codec(label: str | bytes | None) -> tuple[str, str] | None:
    """WHATWG label -> ``(python_codec, canonical_whatwg_name)``; None when
    the label is not in the spec's table (spec: treat as no encoding)."""
    if label is None:
        return None
    if isinstance(label, bytes):
        try:
            label = label.decode("ascii")
        except UnicodeDecodeError:
            return None
    return _LABELS.get(label.strip(" \t\n\r\f").lower())


def _strip_comments(head: bytes) -> bytes:
    """The spec's prescan comment consumption: from ``<!--``, everything
    up to and including the first ``-->`` whose dashes may OVERLAP the
    opener (so the degenerate ``<!-->`` and ``<!--->`` are complete
    comments, as in browsers); an unterminated ``<!--`` swallows the
    rest of the window. Each comment is replaced by ONE SPACE, not
    removed: the prescan skips comments positionally and never joins the
    text around them, so splicing could fabricate a meta tag
    (``<met<!-- -->a charset=..>``) no browser would see."""
    out = []
    pos = 0
    while True:
        start = head.find(b"<!--", pos)
        if start == -1:
            out.append(head[pos:])
            break
        out.append(head[pos:start])
        out.append(b" ")
        end = head.find(b"-->", start + 2)  # +2: opener dashes may overlap
        if end == -1:
            break  # unterminated: rest of the window is comment
        pos = end + 3
    return b"".join(out)


def _meta_tag_end(head: bytes, start: int) -> int:
    """Index of the '>' that closes the tag whose name ends at ``start``,
    via the prescan's own attribute loop (WHATWG "get an attribute"):
    skip whitespace/'/', read a name, and only an '=' AFTER the name
    introduces a value — quoted (a '>' inside is literal; unterminated
    quote = tag never closes) or unquoted (runs to whitespace/'>', so
    '=', quotes and apostrophes inside it are ordinary characters).
    Returns -1 when the tag never closes in the window."""
    i = start
    n = len(head)
    while True:
        while i < n and (head[i] in _WS or head[i] == 0x2F):  # ws or '/'
            i += 1
        if i >= n:
            return -1
        if head[i] == 0x3E:  # '>'
            return i
        # attribute name
        while i < n and head[i] not in _WS \
                and head[i] not in (0x2F, 0x3D, 0x3E):
            i += 1
        while i < n and head[i] in _WS:
            i += 1
        if i < n and head[i] == 0x3D:  # '=': a value follows the name
            i += 1
            while i < n and head[i] in _WS:
                i += 1
            if i < n and head[i] in (0x22, 0x27):  # '"' or "'"
                q = head[i]
                i += 1
                while i < n and head[i] != q:
                    i += 1
                if i >= n:
                    return -1  # unterminated quoted value
                i += 1
            else:
                while i < n and head[i] not in _WS and head[i] != 0x3E:
                    i += 1


def _prescan_meta(head: bytes) -> tuple[str, str] | None:
    """The spec's meta prescan over the first 1024 bytes: the first
    ``<meta charset>`` or ``<meta http-equiv=content-type content=...>``
    with a recognized label wins, in document order. Comments are
    skipped first (the spec's prescan consumes ``<!-- -->`` before
    looking for metas — a commented-out legacy meta must not hijack
    the decode)."""
    head = _strip_comments(head)
    pos = 0
    while True:
        m = _META_START_RE.search(head, pos)
        if m is None:
            return None
        end = _meta_tag_end(head, m.end())
        if end < 0:
            # the tag (e.g. an unterminated quoted value) consumed the
            # rest of the window — the spec's prescan pointer is at EOF,
            # so nothing after it can be a tag
            return None
        # resume past this tag's full span: a '<meta ...>' embedded in a
        # QUOTED attribute value of this tag is markup text, not a tag —
        # restarting inside the span would honor it (hijacked charset)
        pos = end + 1
        tag = head[m.start():end + 1]
        charset = http_equiv = content = None
        for a in _ATTR_RE.finditer(tag[5:]):
            name = a.group(1).lower()
            raw = a.group(2) or b""
            if raw[:1] in (b'"', b"'"):
                raw = raw[1:-1] if raw[-1:] == raw[:1] else raw[1:]
            if name == b"charset" and charset is None:
                charset = raw
            elif name == b"http-equiv" and http_equiv is None:
                http_equiv = raw
            elif name == b"content" and content is None:
                content = raw
        label: bytes | None = None
        if charset is not None:
            label = charset
        elif (http_equiv or b"").strip().lower() == b"content-type" and content:
            c = _CONTENT_CHARSET_RE.search(content)
            if c:
                label = c.group(1).strip(b"\"'")
        if label is None:
            continue
        got = label_to_codec(label)
        if got is None:
            continue
        py, canon = got
        # spec post-steps: UTF-16 from a meta means UTF-8 (the prescan is
        # running over ASCII-compatible bytes, so the document cannot
        # actually be UTF-16); x-user-defined in a meta means windows-1252
        if canon in _UTF16_FAMILY:
            return "utf-8", "utf-8"
        if canon == "x-user-defined":
            return "cp1252", "windows-1252"
        return py, canon
    return None


_CT_CHARSET_RE = re.compile(r"""charset\s*=\s*("[^"]*"|'[^']*'|[^\s;"']+)""",
                            re.IGNORECASE)


def charset_from_content_type(content_type: str | None) -> str | None:
    """The charset parameter of an HTTP ``Content-Type`` header value
    (``text/html; charset=Shift_JIS`` -> ``Shift_JIS``), or None."""
    if not content_type:
        return None
    m = _CT_CHARSET_RE.search(content_type)
    return m.group(1).strip("\"'") if m else None


def _sniff_declared(payload: bytes,
                    content_type: str | None) -> tuple[str, str, str] | None:
    """The DECLARED-encoding steps (BOM > transport > meta prescan), or
    None when only the content-based fallback remains."""
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", "utf-8", "bom"
    if payload[:2] == b"\xfe\xff":
        return "utf-16-be", "utf-16be", "bom"
    if payload[:2] == b"\xff\xfe":
        return "utf-16-le", "utf-16le", "bom"
    got = label_to_codec(charset_from_content_type(content_type))
    if got is not None:
        return got[0], got[1], "transport"
    got = _prescan_meta(payload[:1024])
    if got is not None:
        return got[0], got[1], "meta"
    return None


def sniff_encoding(payload: bytes,
                   content_type: str | None = None) -> tuple[str, str, str]:
    """``(python_codec, canonical_name, how)`` for an HTML byte payload;
    ``how`` is one of ``bom | transport | meta | utf-8 | fallback``.

    ``content_type`` is the transport-layer hint (the HTTP Content-Type
    a WARC response record carries): per the spec's precedence it sits
    between the BOM (which overrides everything) and the meta prescan.
    Unknown labels are ignored, not errors.

    CAVEAT — sentinel pseudo-codecs: when the winning label maps to the
    spec's *replacement* or *x-user-defined* encodings, the returned
    ``python_codec`` is the internal sentinel ``"_replacement"`` /
    ``"_x-user-defined"``, which ``bytes.decode`` does NOT know
    (LookupError). They exist so provenance rollups can count these
    hostile/legacy labels distinctly; to actually decode, use
    ``sniff_decode``, which special-cases both (one U+FFFD for
    replacement; the spec's 0xF780 mapping for x-user-defined)."""
    got = _sniff_declared(payload, content_type)
    if got is not None:
        return got
    try:
        payload.decode("utf-8")
        return "utf-8", "utf-8", "utf-8"
    except UnicodeDecodeError:
        return "cp1252", "windows-1252", "fallback"


def _decode_x_user_defined(payload: bytes) -> str:
    # 0x00-0x7F identity, 0x80-0xFF -> U+F780 + (b - 0x80)
    return "".join(chr(b) if b < 0x80 else chr(0xF780 + b - 0x80)
                   for b in payload)


def sniff_decode(payload: bytes,
                 content_type: str | None = None) -> tuple[str, str]:
    """Decode HTML bytes per the WHATWG sniffing algorithm.

    Returns ``(text, canonical_encoding_name)``. Never raises: decoding
    runs in the spec's replacement mode (malformed sequences -> U+FFFD).
    ``content_type`` is the optional transport-layer charset hint.
    """
    declared = _sniff_declared(payload, content_type)
    if declared is None:
        # content-based fallback: attempt the strict UTF-8 decode ONCE and
        # keep its result — UTF-8 is the dominant path and this runs
        # per-document in the extraction UDF, so a discarded probe decode
        # would double the decode CPU of ~90%+ of the corpus
        try:
            return payload.decode("utf-8"), "utf-8"
        except UnicodeDecodeError:
            return payload.decode("cp1252", errors="whatwg1252"), "windows-1252"
    py, canon, how = declared
    if py == "_replacement":
        return "�", canon
    if py == "_x-user-defined":
        return _decode_x_user_defined(payload), canon
    if how == "bom" and py in ("utf-16-le", "utf-16-be"):
        # the BOM is consumed by detection, not emitted (utf-8-sig strips
        # its own; the endian-explicit utf-16 codecs do not)
        payload = payload[2:]
    errors = "whatwg1252" if py == "cp1252" else "replace"
    try:
        return payload.decode(py, errors=errors), canon
    except Exception:
        # a truncated multi-byte BOM tail etc. — never fail the document
        return payload.decode("utf-8", errors="replace"), "utf-8"
