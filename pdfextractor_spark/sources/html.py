"""HTML main-content extraction (boilerplate strip).

New capability required by the graft (no reference counterpart): a
readability/boilerpipe-style heuristic built from published text-density and
link-density signals, implemented deterministically over the stdlib HTML
parser so extracted text is reproducible byte-for-byte.

Rules (fixed, golden-tested):
- ``script/style/noscript/template/svg/iframe/form/button/select/nav/header/
  footer/aside`` subtrees are dropped entirely.
- Block-level boundaries (p, div, li, h1-6, td, th, blockquote, pre, article,
  section, main, figcaption, dd, dt, tr) delimit candidate text blocks.
- A block is CONTENT iff its link density (chars inside <a> / total chars)
  is <= 1/3 AND it has >= 25 characters — or it is a heading (h1-h4) with
  >= 8 characters and link density <= 1/3.
- Kept blocks are emitted in document order joined with '\\n'.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = ["extract_html_text", "extract_html_text_density"]

_DROP_TAGS = {
    "script", "style", "noscript", "template", "svg", "iframe", "form",
    "button", "select", "option", "nav", "header", "footer", "aside",
}
_BLOCK_TAGS = {
    "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "td", "th",
    "blockquote", "pre", "article", "section", "main", "figcaption",
    "dd", "dt", "tr", "ul", "ol", "table", "body",
}
_HEADING_TAGS = {"h1", "h2", "h3", "h4"}

_WS = re.compile(r"\s+")


# every ASCII char \s matches except the plain space (re treats the
# C0 separators \x1c-\x1f as whitespace too)
_WS_ASCII_NONSPACE = frozenset("\t\n\r\x0b\x0c\x1c\x1d\x1e\x1f")


def _squash_ws(s: str) -> str:
    """``_WS.sub(" ", s)`` with a C-speed gate: ASCII strings whose only
    whitespace is single spaces pass through unchanged (the sub would be
    an identity copy). Non-ASCII always takes the regex (\\s matches
    Unicode spaces). Equivalence is property-pinned
    (tests/test_properties.py::test_squash_ws_gate_equivalent)."""
    if s.isascii():
        if "  " in s or not _WS_ASCII_NONSPACE.isdisjoint(s):
            return _WS.sub(" ", s)
        return s
    return _WS.sub(" ", s)


class _Block:
    __slots__ = ("tag", "chars", "link_chars", "link_text", "opened",
                 "first_text", "_text", "_text_nchunks")

    def __init__(self, tag: str):
        self.tag = tag
        self.chars: list[str] = []
        self.link_chars = 0
        # anchor text runs, kept verbatim so density mode can count link
        # WORDS (the published NumWordsRules classifier defines link
        # density over anchor words / total words; the char-based ratio
        # skews high for long-word anchors). The default mode keeps its
        # pinned char-based gate.
        self.link_text: list[str] = []
        self.opened = 0  # document OPEN order (set at push)
        # order counter at the block's FIRST data run: document position
        # of where the block's text actually STARTS — a container whose
        # direct text follows its children (caption after a list) sorts
        # after them, where open order would not. Density mode sorts on
        # this. (A container with text both before AND after children is
        # ordered by its first run — the one approximation left.)
        self.first_text: int | None = None
        self._text: str | None = None
        self._text_nchunks = -1

    def text(self) -> str:
        # memoized on the chunk count: ``chars`` is append-only, so an
        # unchanged length means unchanged content (text() is evaluated
        # twice per kept block — the content gate and the output pass)
        if self._text_nchunks != len(self.chars):
            self._text = _squash_ws("".join(self.chars)).strip()
            self._text_nchunks = len(self.chars)
        return self._text

    def link_words(self) -> int:
        return len(_squash_ws("".join(self.link_text)).split())


class _ContentParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.drop_depth = 0
        self.link_depth = 0
        self.block_stack: list[_Block] = []
        self.finished: list[tuple[int, _Block]] = []  # (doc_order, block)
        self._order = 0

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in _DROP_TAGS:
            self.drop_depth += 1
            return
        if self.drop_depth:
            return
        if tag == "a":
            self.link_depth += 1
            # anchor-boundary separator: link_text runs from DIFFERENT
            # anchors must not concatenate into one "word" ('<a>Home</a>
            # <a>About</a>' counting 1 anchor word instead of 2 drives
            # link density far under its true value and keeps nav blocks)
            if self.block_stack:
                self.block_stack[-1].link_text.append(" ")
        if tag == "br" and self.block_stack:
            self.block_stack[-1].chars.append(" ")
        if tag in _BLOCK_TAGS:
            self._order += 1
            blk = _Block(tag)
            blk.opened = self._order
            self.block_stack.append(blk)

    def handle_startendtag(self, tag, attrs):
        if tag.lower() == "br" and self.block_stack and not self.drop_depth:
            self.block_stack[-1].chars.append(" ")

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in _DROP_TAGS:
            self.drop_depth = max(0, self.drop_depth - 1)
            return
        if self.drop_depth:
            return
        if tag == "a":
            self.link_depth = max(0, self.link_depth - 1)
        if tag in _BLOCK_TAGS:
            # close the innermost matching open block
            for i in range(len(self.block_stack) - 1, -1, -1):
                if self.block_stack[i].tag == tag:
                    blk = self.block_stack.pop(i)
                    self._order += 1
                    self.finished.append((self._order, blk))
                    break

    def handle_data(self, data):
        if self.drop_depth or not data:
            return
        if self.block_stack:
            blk = self.block_stack[-1]
            if blk.first_text is None and not data.isspace():
                self._order += 1
                blk.first_text = self._order
            blk.chars.append(data)
            if self.link_depth:
                blk.link_chars += len(_squash_ws(data))
                blk.link_text.append(data)


def _is_content(blk: _Block) -> bool:
    text = blk.text()
    n = len(text)
    if n == 0:
        return False
    link_density = blk.link_chars / max(1, n)
    if link_density > 1 / 3:
        return False
    if blk.tag in _HEADING_TAGS:
        return n >= 8
    return n >= 25


# ---------------------------------------------------------------------------
# Fast tokenizer path
# ---------------------------------------------------------------------------
#
# html.parser.HTMLParser spends most of its time in goahead()'s pure-python
# scanning; for well-formed markup the same event stream can be produced with
# a handful of C-level regex matches per tag. The tokenizer below drives the
# SAME _ContentParser handlers and falls back to the stdlib parser for the
# whole document the moment it sees any construct whose stdlib semantics are
# nontrivial (malformed tags, doctype-internal subsets, marked sections,
# unterminated comments), so extracted text is byte-identical on every input:
# either both paths see the same event stream, or the stdlib path runs alone.


class _FastUnsupported(Exception):
    pass


_FAST_TAG = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9:._-]*)"                      # tag name
    r"((?:\s+[a-zA-Z_:@#][a-zA-Z0-9:._@#-]*"            # attr name
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>\"'`=<]+))?" # attr value
    r")*)"
    r"\s*(/?)>"
)
_FAST_ENDTAG = re.compile(r"</([a-zA-Z][a-zA-Z0-9:._-]*)\s*>")
_FAST_CDATA_CLOSE = {
    elem: re.compile(r"</\s*%s\s*>" % elem, re.I) for elem in ("script", "style")
}

from html import unescape as _unescape


def _fast_feed(parser: _ContentParser, html: str) -> None:
    """Replay html.parser's event stream over ``parser`` for well-formed
    markup; raises _FastUnsupported to defer to the stdlib parser."""
    n = len(html)
    i = 0
    tag_match = _FAST_TAG.match
    end_match = _FAST_ENDTAG.match
    find = html.find
    handle_data = parser.handle_data
    handle_starttag = parser.handle_starttag
    handle_endtag = parser.handle_endtag
    while i < n:
        j = find("<", i)
        if j < 0:
            handle_data(_unescape(html[i:]) if "&" in html[i:] else html[i:])
            break
        if j > i:
            run = html[i:j]
            handle_data(_unescape(run) if "&" in run else run)
        i = j
        nxt = html[i + 1] if i + 1 < n else ""
        if nxt == "/":
            m = end_match(html, i)
            if m is None:
                raise _FastUnsupported  # tolerant-endtag / bogus-comment path
            handle_endtag(m.group(1).lower())
            i = m.end()
        elif nxt == "!":
            if html.startswith("<!--", i):
                e = find("-->", i + 4)
                if e < 0:
                    raise _FastUnsupported  # EOF-in-comment salvage differs
                i = e + 3
            else:
                e = find(">", i + 2)
                chunk = html[i:e] if e >= 0 else ""
                if e < 0 or "[" in chunk or '"' in chunk or "'" in chunk:
                    # marked section / internal subset / quoted external id:
                    # markupbase scans these past a bare '>', so defer
                    raise _FastUnsupported
                i = e + 1  # doctype or bogus comment: no events either way
        elif nxt == "?":
            e = find(">", i + 2)
            if e < 0:
                raise _FastUnsupported
            i = e + 1  # processing instruction: no events
        elif nxt.isalpha() and nxt.isascii():
            m = tag_match(html, i)
            if m is None:
                raise _FastUnsupported  # tolerant start-tag salvage differs
            tag = m.group(1).lower()
            i = m.end()
            if m.group(3):  # '/>' — XHTML empty tag, never enters CDATA mode
                parser.handle_startendtag(tag, [])
            else:
                handle_starttag(tag, [])
                if tag in ("script", "style"):
                    # rawtext mode: stdlib ends it at the first close tag
                    # matching endtagfind for this element (``</\s*elem\s*>``)
                    # — false probes like ``</scriptx`` or ``</script foo>``
                    # stay rawtext there AND fail this regex, so the end
                    # position is identical. Data events inside are dropped
                    # by the engine (script/style are _DROP_TAGS), so their
                    # exact segmentation is irrelevant.
                    c = _FAST_CDATA_CLOSE[tag].search(html, i)
                    if c is None:
                        # EOF inside rawtext: stdlib emits the rest as data
                        handle_data(html[i:])
                        break
                    handle_data(html[i:c.start()])
                    handle_endtag(tag)
                    i = c.end()
        else:
            # bare '<' before a non-tag char: stdlib emits it as one-char data
            handle_data("<")
            i += 1


def _parse_blocks(html: str) -> list[_Block]:
    """Text blocks in CLOSE order (the default mode's emission order;
    each block's ``opened`` carries document open order for consumers
    that need true document sequence), fast tokenizer with stdlib
    fallback, unclosed blocks flushed — the shared front half of both
    extraction modes."""
    parser = _ContentParser()
    try:
        _fast_feed(parser, html)
    except _FastUnsupported:
        parser = _ContentParser()
        try:
            parser.feed(html)
            parser.close()
        except Exception:
            pass  # salvage whatever blocks were finished
    except Exception:
        pass  # same salvage policy as the stdlib path
    # flush unclosed blocks in stack order
    for blk in parser.block_stack:
        parser._order += 1
        parser.finished.append((parser._order, blk))
    parser.finished.sort(key=lambda t: t[0])
    return [blk for _, blk in parser.finished]


def _dedup_join(blocks_text: list[str]) -> str:
    out: list[str] = []
    seen_texts: set[int] = set()
    for text in blocks_text:
        key = hash(text)
        if key in seen_texts:
            continue
        seen_texts.add(key)
        out.append(text)
    return "\n".join(out)


def extract_html_text(html: str) -> str:
    """Main-content text of an HTML document, one block per line."""
    # NOTE: container tags (div/ul/body/...) only ever accumulate their
    # *direct* text runs — nested block text goes to the inner block on the
    # stack — so there is no double counting.
    return _dedup_join(
        blk.text() for blk in _parse_blocks(html) if _is_content(blk))


def extract_html_text_density(html: str) -> str:
    """Main-content text via the published boilerpipe NumWordsRules
    decision tree (Kohlschuetter, Fankhauser & Nejdl, WSDM 2010 —
    "Boilerplate Detection using Shallow Text Features", table 2 /
    the reference implementation's NumWordsRulesClassifier): each block
    is judged by its own word count + link density AND its neighbors'
    — context the per-block threshold of the default mode cannot see.
    Favors recall on short interstitial content blocks between long
    paragraphs; the default mode favors precision. Both share the same
    tokenizer/block builder, so plans and failure policy are identical.
    """
    # neighbor context must be DOCUMENT order: _parse_blocks returns
    # close order, which inverts nested structures (a container with
    # direct text closes after its children and would see the wrong
    # prev/next). Sort on where each block's text STARTS — open order
    # would misplace a container whose direct text follows its children
    # (caption after a list).
    blocks = sorted((b for b in _parse_blocks(html) if b.text()),
                    key=lambda b: (b.first_text
                                   if b.first_text is not None else b.opened))

    def words(i: int) -> int:
        if i < 0 or i >= len(blocks):
            return 0
        return len(blocks[i].text().split())

    def link_density(i: int) -> float:
        # anchor WORDS over total words — the published classifier's
        # definition (a char ratio skews high for long-word anchors and
        # shifts keep/drop decisions off the cited decision tree)
        if i < 0 or i >= len(blocks):
            return 0.0
        return blocks[i].link_words() / max(1, len(blocks[i].text().split()))

    kept: list[str] = []
    for i in range(len(blocks)):
        if link_density(i) > 0.333333:
            continue
        if link_density(i - 1) <= 0.555556:
            is_content = (words(i) > 16 or words(i + 1) > 15
                          or words(i - 1) > 4)
        else:
            is_content = words(i) > 40 or words(i + 1) > 17
        if is_content:
            kept.append(blocks[i].text())
    return _dedup_join(kept)
