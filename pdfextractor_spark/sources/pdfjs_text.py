"""pdf-parse-compatible PDF text extraction — the reference's PRIMARY path.

The reference's bronze ``rawText`` for real-world PDFs is produced by
pdf-parse@1.1.1 (ref: backend/services/pdfParsePatched.js:13-21,
backend/routes/upload.js:37-54, backend/scripts/batch_bronze_mdeq.js:29-37),
which drives the bundled pdf.js v1.10.100 ``getTextContent`` with
``{normalizeWhitespace: false, disableCombineTextItems: false}`` and then
joins items with a newline whenever ``item.transform[5]`` (device-space y)
changes, prefixing every page with a blank line (pdf-parse
``lib/pdf-parse.js`` render_page / main loop).

This module reimplements, from first principles over the published PDF 1.7
object model (ISO 32000) and the documented pdf.js text-content semantics,
the subset needed to reproduce that text on real-world documents:

- document loading: classic xref tables, xref streams (/Type/XRef with PNG
  predictors), hybrid files (/XRefStm), /Prev chains, object streams
  (/Type/ObjStm), plus a brute-force "N G obj" scan fallback for broken files
- filters: FlateDecode (+ predictors), ASCIIHex, ASCII85, RunLength
- page tree recursion with inherited /Resources, /Contents arrays
- fonts: simple (Type1/TrueType) with /ToUnicode CMaps, base encodings
  (WinAnsi/MacRoman/Standard) and /Differences; composite Type0/Identity-H
  with /ToUnicode and /W widths
- the pdf.js v1.10 text-content builder: per-glyph advances (charSpacing,
  wordSpacing, Tz), fake-space insertion (SPACE_FACTOR 0.3 /
  MULTI_SPACE_FACTOR 1.5 / MULTI_SPACE_FACTOR_MAX 4 of the font's space
  width), same-line Td / Tm combining, text-run breaking, ligature
  normalization, and item transforms via ctm x textMatrix x [fs*h,0,0,fs,0,rise]

No external PDF library is used, so the output is reproducible byte-for-byte
and its parity against the reference's shipped bronze corpus is pinned by
tests/test_mdeq_parity.py.
"""

from __future__ import annotations

import re
import struct
import zlib

__all__ = ["extract_text_pdfparse", "PdfError", "PdfDocument"]


class PdfError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Object model / lexer
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_REGULAR_END = _WS + _DELIM


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self):
        return f"Ref({self.num},{self.gen})"

    def __eq__(self, o):
        return isinstance(o, Ref) and o.num == self.num and o.gen == self.gen

    def __hash__(self):
        return hash((self.num, self.gen))


class Name(str):
    """PDF name object; distinct from a text string."""


class StreamObj:
    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw


class Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def skip_ws(self):
        data, n = self.data, len(self.data)
        p = self.pos
        while p < n:
            c = data[p]
            if c in _WS:
                p += 1
            elif c == 0x25:  # % comment
                e = data.find(b"\n", p)
                e2 = data.find(b"\r", p)
                if e == -1 or (e2 != -1 and e2 < e):
                    e = e2
                p = len(data) if e == -1 else e + 1
            else:
                break
        self.pos = p

    def _read_token_end(self, start: int) -> int:
        data, n = self.data, len(self.data)
        p = start
        while p < n and data[p] not in _REGULAR_END:
            p += 1
        return p

    def parse_object(self):
        """Parse one object at self.pos (after skipping whitespace)."""
        self.skip_ws()
        data = self.data
        p = self.pos
        if p >= len(data):
            raise PdfError("EOF while parsing object")
        c = data[p : p + 1]
        if c == b"/":
            end = self._read_token_end(p + 1)
            raw = data[p + 1 : end]
            self.pos = end
            return Name(_decode_name(raw))
        if c == b"(":
            return self._parse_literal_string()
        if c == b"<":
            if data[p + 1 : p + 2] == b"<":
                return self._parse_dict_or_stream()
            return self._parse_hex_string()
        if c == b"[":
            self.pos = p + 1
            arr = []
            while True:
                self.skip_ws()
                if self.data[self.pos : self.pos + 1] == b"]":
                    self.pos += 1
                    return arr
                arr.append(self.parse_object())
        if c == b"]" or c == b">" or c == b")" or c == b"}" or c == b"{":
            self.pos = p + 1
            raise PdfError(f"unexpected delimiter {c!r}")
        # number / keyword / ref
        end = self._read_token_end(p + 1 if c in b"+-" else p)
        tok = data[p:end]
        self.pos = end
        if tok == b"true":
            return True
        if tok == b"false":
            return False
        if tok == b"null":
            return None
        try:
            if re.fullmatch(rb"[+-]?\d+", tok):
                num = int(tok)
                # lookahead for "gen R"
                save = self.pos
                try:
                    self.skip_ws()
                    m = re.match(rb"(\d+)", data[self.pos :][:12])
                    if m and num >= 0:
                        p2 = self.pos + m.end()
                        l2 = Lexer(data, p2)
                        l2.skip_ws()
                        if data[l2.pos : l2.pos + 1] == b"R" and (
                            l2.pos + 1 >= len(data) or data[l2.pos + 1] in _REGULAR_END
                        ):
                            self.pos = l2.pos + 1
                            return Ref(num, int(m.group(1)))
                except PdfError:
                    pass
                self.pos = save
                return num
            return float(tok)
        except ValueError as e:
            raise PdfError(f"bad token {tok[:40]!r}") from e

    def _parse_literal_string(self) -> bytes:
        data = self.data
        p = self.pos + 1
        depth = 1
        out = bytearray()
        n = len(data)
        while p < n:
            c = data[p]
            if c == 0x5C:  # backslash
                if p + 1 >= n:
                    break
                nxt = data[p + 1]
                if nxt in b"nrtbf":
                    out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\x08", 0x66: b"\x0c"}[nxt]
                    p += 2
                elif nxt in b"()\\":
                    out.append(nxt)
                    p += 2
                elif 0x30 <= nxt <= 0x37:  # octal
                    j = p + 1
                    oc = 0
                    k = 0
                    while j < n and k < 3 and 0x30 <= data[j] <= 0x37:
                        oc = oc * 8 + (data[j] - 0x30)
                        j += 1
                        k += 1
                    out.append(oc & 0xFF)
                    p = j
                elif nxt == 0x0D:  # line continuation
                    p += 2
                    if p < n and data[p] == 0x0A:
                        p += 1
                elif nxt == 0x0A:
                    p += 2
                else:
                    out.append(nxt)
                    p += 2
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = p + 1
                    return bytes(out)
            elif c == 0x0D:  # CR or CRLF -> LF per spec
                out.append(0x0A)
                p += 1
                if p < n and data[p] == 0x0A:
                    p += 1
                continue
            out.append(c)
            p += 1
        raise PdfError("unterminated string")

    def _parse_hex_string(self) -> bytes:
        data = self.data
        e = data.find(b">", self.pos + 1)
        if e == -1:
            raise PdfError("unterminated hex string")
        hexs = re.sub(rb"[^0-9A-Fa-f]", b"", data[self.pos + 1 : e])
        if len(hexs) % 2:
            hexs += b"0"
        self.pos = e + 1
        return bytes.fromhex(hexs.decode("ascii"))

    def _parse_dict_or_stream(self):
        self.pos += 2
        d = {}
        while True:
            self.skip_ws()
            nxt = self.data[self.pos : self.pos + 2]
            if nxt == b">>":
                self.pos += 2
                break
            key = self.parse_object()
            if not isinstance(key, Name):
                raise PdfError(f"dict key not a name: {key!r}")
            d[str(key)] = self.parse_object()
        # stream?
        save = self.pos
        self.skip_ws()
        if self.data[self.pos : self.pos + 6] == b"stream":
            p = self.pos + 6
            if self.data[p : p + 2] == b"\r\n":
                p += 2
            elif self.data[p : p + 1] in (b"\n", b"\r"):
                p += 1
            return ("__stream__", d, p)  # raw extraction resolved by document
        self.pos = save
        return d


def _decode_name(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        if raw[i] == 0x23 and i + 2 < len(raw) + 1:
            try:
                out.append(int(raw[i + 1 : i + 3], 16))
                i += 3
                continue
            except ValueError:
                pass
        out.append(raw[i])
        i += 1
    return out.decode("latin-1")


# ---------------------------------------------------------------------------
# Filters
# ---------------------------------------------------------------------------


def _apply_png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    bpp = max(1, (colors * bpc) // 8)
    row_len = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(row_len)
    pos = 0
    n = len(data)
    while pos + 1 <= n:
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + row_len])
        if len(row) < row_len:
            row += bytes(row_len - len(row))
        pos += 1 + row_len
        if ft == 1:  # Sub
            for i in range(bpp, row_len):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(row_len):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(row_len):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(row_len):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        out += row
        prev = row
        if pos >= n:
            break
    return bytes(out)


def _decode_stream_data(doc: "PdfDocument", sdict: dict, raw: bytes) -> bytes:
    filters = doc.resolve(sdict.get("Filter"))
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = doc.resolve(sdict.get("DecodeParms") or sdict.get("DP"))
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = raw
    for f, pm in zip(filters, parms):
        f = str(doc.resolve(f))
        pm = doc.resolve(pm) or {}
        if f in ("FlateDecode", "Fl"):
            try:
                data = zlib.decompress(data)
            except zlib.error:
                # tolerate trailing garbage / missing checksum
                try:
                    data = zlib.decompressobj().decompress(data)
                except zlib.error as e:
                    raise PdfError(f"bad flate stream: {e}") from e
            pred = doc.resolve(pm.get("Predictor", 1)) or 1
            if pred >= 10:
                data = _apply_png_predictor(
                    data,
                    doc.resolve(pm.get("Colors", 1)) or 1,
                    doc.resolve(pm.get("BitsPerComponent", 8)) or 8,
                    doc.resolve(pm.get("Columns", 1)) or 1,
                )
            elif pred == 2:
                raise PdfError("TIFF predictor unsupported")
        elif f in ("ASCIIHexDecode", "AHx"):
            data = bytes.fromhex(
                re.sub(rb"[^0-9A-Fa-f]", b"", data.split(b">")[0]).decode("ascii")
            )
        elif f in ("ASCII85Decode", "A85"):
            import base64

            body = data.split(b"~>")[0]
            body = re.sub(rb"\s", b"", body)
            if body.startswith(b"<~"):
                body = body[2:]
            data = base64.a85decode(body)
        elif f in ("RunLengthDecode", "RL"):
            out = bytearray()
            i = 0
            while i < len(data):
                l = data[i]
                if l == 128:
                    break
                if l < 128:
                    out += data[i + 1 : i + 2 + l]
                    i += 2 + l
                else:
                    out += data[i + 1 : i + 2] * (257 - l)
                    i += 2
            data = bytes(out)
        elif f in ("DCTDecode", "JPXDecode", "CCITTFaxDecode", "JBIG2Decode"):
            return data  # image data: callers never decode text from these
        elif f == "Crypt":
            raise PdfError("encrypted stream")
        else:
            raise PdfError(f"unsupported filter {f}")
    return data


# ---------------------------------------------------------------------------
# Document: xref (tables + streams + ObjStm), object access
# ---------------------------------------------------------------------------


class PdfDocument:
    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            # some files have junk before the header
            idx = data.find(b"%PDF-")
            if idx == -1:
                raise PdfError("not a PDF")
            data = data[idx:]
        self.data = data
        self.xref: dict[int, tuple] = {}  # num -> ('n', offset) | ('o', stmnum, idx)
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, dict[int, object]] = {}
        self._brute: dict[int, int] | None = None
        try:
            self._load_xref()
        except PdfError:
            self.xref = {}
        if not self.xref or "Root" not in self.trailer:
            self._brute_scan()
        if self.resolve(self.trailer.get("Encrypt")) is not None:
            raise PdfError("encrypted PDF unsupported")

    # -- xref loading --------------------------------------------------------

    def _load_xref(self):
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", self.data[-2048:]):
            pass
        if not m:
            raise PdfError("no startxref")
        offset = int(m.group(1))
        seen = set()
        while offset and offset not in seen and 0 <= offset < len(self.data):
            seen.add(offset)
            lex = Lexer(self.data, offset)
            lex.skip_ws()
            if self.data[lex.pos : lex.pos + 4] == b"xref":
                trailer = self._parse_xref_table(lex.pos + 4)
            else:
                trailer = self._parse_xref_stream_at(offset)
            if not self.trailer:
                self.trailer = dict(trailer)
            else:
                for k, v in trailer.items():
                    self.trailer.setdefault(k, v)
            # hybrid: /XRefStm points to an xref stream with more entries
            xrs = trailer.get("XRefStm")
            if isinstance(xrs, int) and xrs not in seen:
                seen.add(xrs)
                try:
                    self._parse_xref_stream_at(xrs)
                except PdfError:
                    pass
            prev = trailer.get("Prev")
            offset = prev if isinstance(prev, int) else 0

    def _parse_xref_table(self, pos: int) -> dict:
        lex = Lexer(self.data, pos)
        while True:
            lex.skip_ws()
            if self.data[lex.pos : lex.pos + 7] == b"trailer":
                lex.pos += 7
                t = lex.parse_object()
                if not isinstance(t, dict):
                    raise PdfError("bad trailer")
                return t
            m = re.match(rb"(\d+)\s+(\d+)", self.data[lex.pos : lex.pos + 40])
            if not m:
                raise PdfError("bad xref subsection header")
            start, count = int(m.group(1)), int(m.group(2))
            lex.pos += m.end()
            lex.skip_ws()
            for i in range(count):
                ent = self.data[lex.pos : lex.pos + 20]
                em = re.match(rb"(\d{10})\s(\d{5})\s([nf])", ent)
                if not em:
                    raise PdfError("bad xref entry")
                if em.group(3) == b"n" and (start + i) not in self.xref:
                    self.xref[start + i] = ("n", int(em.group(1)))
                # entries are exactly 18 bytes + 2 byte EOL, but be tolerant
                nl = ent.find(b"n", em.start(3))
                lex.pos += em.end()
                lex.skip_ws()

    def _parse_xref_stream_at(self, offset: int) -> dict:
        sobj = self._parse_indirect_at(offset)
        if not isinstance(sobj, StreamObj):
            raise PdfError("xref stream expected")
        d = sobj.dict
        data = _decode_stream_data(self, d, sobj.raw)
        w = [self.resolve(x) for x in self.resolve(d.get("W", []))]
        if not w or len(w) < 3:
            raise PdfError("bad /W")
        size = self.resolve(d.get("Size", 0))
        index = self.resolve(d.get("Index")) or [0, size]
        rw = sum(w)
        pos = 0

        def field(row, k):
            s = sum(w[:k])
            return int.from_bytes(row[s : s + w[k]], "big") if w[k] else (1 if k == 0 else 0)

        for i in range(0, len(index), 2):
            start, count = self.resolve(index[i]), self.resolve(index[i + 1])
            for j in range(count):
                if pos + rw > len(data):
                    break
                row = data[pos : pos + rw]
                pos += rw
                num = start + j
                if num in self.xref:
                    continue
                t = field(row, 0)
                if t == 1:
                    self.xref[num] = ("n", field(row, 1))
                elif t == 2:
                    self.xref[num] = ("o", field(row, 1), field(row, 2))
        return d

    # -- object access -------------------------------------------------------

    def _parse_indirect_at(self, offset: int):
        m = re.compile(rb"(\d+)\s+(\d+)\s+obj").match(self.data, offset) or re.compile(
            rb"\s*(\d+)\s+(\d+)\s+obj"
        ).match(self.data, offset)
        if not m:
            raise PdfError(f"no obj header at {offset}")
        lex = Lexer(self.data, m.end())
        obj = lex.parse_object()
        if isinstance(obj, tuple) and obj[0] == "__stream__":
            _, d, dstart = obj
            length = self.resolve(d.get("Length"))
            raw = None
            if isinstance(length, int) and length >= 0:
                cand = self.data[dstart : dstart + length]
                after = self.data[dstart + length : dstart + length + 20]
                if re.match(rb"\s*endstream", after):
                    raw = cand
            if raw is None:  # length wrong/indirect-unresolvable: scan
                e = self.data.find(b"endstream", dstart)
                if e == -1:
                    raise PdfError("unterminated stream")
                raw = self.data[dstart:e]
                if raw.endswith(b"\r\n"):
                    raw = raw[:-2]
                elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                    raw = raw[:-1]
            return StreamObj(d, raw)
        return obj

    def _brute_scan(self):
        """Index every `N G obj` in the file (last occurrence wins, matching
        incremental-update semantics) — the recovery path pdf.js also has."""
        if self._brute is not None:
            return
        self._brute = {}
        for m in re.finditer(rb"(?:^|[\r\n\s])(\d+)\s+(\d+)\s+obj\b", self.data):
            self._brute[int(m.group(1))] = m.start(1)
        for num, off in self._brute.items():
            self.xref.setdefault(num, ("n", off))
        if "Root" not in self.trailer:
            for m in re.finditer(rb"trailer", self.data):
                try:
                    lex = Lexer(self.data, m.end())
                    t = lex.parse_object()
                    if isinstance(t, dict) and "Root" in t:
                        self.trailer = t
                        break
                except PdfError:
                    continue
            if "Root" not in self.trailer:
                # look for a /Type /Catalog object
                for num in self.xref:
                    try:
                        o = self.get(num)
                    except PdfError:
                        continue
                    if isinstance(o, dict) and o.get("Type") == "Catalog":
                        self.trailer = {"Root": Ref(num, 0)}
                        break

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        ent = self.xref.get(num)
        if ent is None:
            self._brute_scan()
            ent = self.xref.get(num)
            if ent is None:
                return None
        try:
            if ent[0] == "n":
                obj = self._parse_indirect_at(ent[1])
            else:
                obj = self._get_from_objstm(ent[1], ent[2], num)
        except PdfError:
            # xref offset wrong: fall back to brute scan position
            self._brute_scan()
            off = self._brute.get(num)
            obj = self._parse_indirect_at(off) if off is not None else None
        self._cache[num] = obj
        return obj

    def _get_from_objstm(self, stm_num: int, idx: int, want: int):
        objs = self._objstm_cache.get(stm_num)
        if objs is None:
            sobj = self.get(stm_num)
            if not isinstance(sobj, StreamObj):
                raise PdfError(f"ObjStm {stm_num} missing")
            data = _decode_stream_data(self, sobj.dict, sobj.raw)
            n = self.resolve(sobj.dict.get("N", 0))
            first = self.resolve(sobj.dict.get("First", 0))
            hdr = Lexer(data, 0)
            pairs = []
            for _ in range(n):
                onum = hdr.parse_object()
                ooff = hdr.parse_object()
                pairs.append((onum, ooff))
            objs = {}
            for onum, ooff in pairs:
                try:
                    lx = Lexer(data, first + ooff)
                    o = lx.parse_object()
                    if isinstance(o, tuple):
                        o = None  # streams not allowed in ObjStm
                    objs[onum] = o
                except PdfError:
                    objs[onum] = None
            self._objstm_cache[stm_num] = objs
        if want not in objs:
            raise PdfError(f"obj {want} not in ObjStm {stm_num}")
        return objs[want]

    def resolve(self, obj):
        depth = 0
        while isinstance(obj, Ref) and depth < 32:
            obj = self.get(obj.num)
            depth += 1
        return obj

    def stream_bytes(self, obj) -> bytes:
        obj = self.resolve(obj)
        if not isinstance(obj, StreamObj):
            raise PdfError("not a stream")
        return _decode_stream_data(self, obj.dict, obj.raw)

    # -- page tree -----------------------------------------------------------

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PdfError("no catalog")
        tree = self.resolve(root.get("Pages"))
        out: list[dict] = []
        seen: set[int] = set()

        def walk(node, inherited):
            if not isinstance(node, dict):
                return
            inh = dict(inherited)
            for k in ("Resources", "MediaBox", "Rotate", "CropBox"):
                if k in node:
                    inh[k] = node[k]
            t = node.get("Type")
            kids = self.resolve(node.get("Kids"))
            if t == "Page" or (kids is None and t != "Pages"):
                page = dict(node)
                for k, v in inh.items():
                    page.setdefault(k, v)
                out.append(page)
                return
            if isinstance(kids, list):
                for kid in kids:
                    if isinstance(kid, Ref):
                        if kid.num in seen:
                            continue
                        seen.add(kid.num)
                    walk(self.resolve(kid), inh)

        walk(tree, {})
        if not out:
            # fallback: any /Type /Page object in file order
            self._brute_scan()
            for num in sorted(self.xref):
                o = self.get(num)
                if isinstance(o, dict) and o.get("Type") == "Page":
                    out.append(o)
        if not out:
            raise PdfError("no pages")
        return out

    def page_content(self, page: dict) -> bytes:
        c = self.resolve(page.get("Contents"))
        if c is None:
            return b""
        parts = []
        if isinstance(c, list):
            for item in c:
                item = self.resolve(item)
                if isinstance(item, StreamObj):
                    parts.append(_decode_stream_data(self, item.dict, item.raw))
        elif isinstance(c, StreamObj):
            parts.append(_decode_stream_data(self, c.dict, c.raw))
        return b"\n".join(parts)
