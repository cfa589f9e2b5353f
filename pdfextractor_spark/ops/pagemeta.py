"""Native HTML page-metadata extraction (title / meta description /
OpenGraph / canonical link / declared language).

A training-data pipeline wants typed page metadata next to the extracted
main content — titles for document labeling, canonical links for URL
folding beyond RFC 3986 (the site's OWN dedup hint), declared language
to cross-check the n-gram guesser, publish dates for temporal slicing.
Unlike the main-content extractor (``sources/html.py``, a full
tree-walking parser that must weigh text density), these fields live in
``<head>`` in near-fixed shapes, so they are extracted with JVM-side
``regexp_extract`` over the raw bytes: map-only, zero Python, and
Catalyst fuses the whole projection into the page-scan stage at any
corpus size.

Regex-over-HTML caveats, made explicit: patterns match the FIRST
occurrence in byte order (browsers honor the first ``<title>`` too),
attribute order is handled by a both-orders alternation, and quoting
variants (single/double) are accepted. Unquoted attribute values and
exotic markup fall back to NULL — at crawl scale a missing title is an
audit statistic, not an error. Only the five standard named entities and
decimal/hex numeric references are unescaped (full entity tables belong
to the content extractor).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["page_meta", "with_page_meta"]


def _first(html: Column, pattern: str) -> Column:
    """First capture of ``pattern`` (case-insensitive, dot-matches-newline)
    or NULL when absent — ``regexp_extract`` returns '' on no-match, which
    would be indistinguishable from a genuinely empty attribute."""
    got = F.regexp_extract(html, "(?is)" + pattern, 1)
    return F.when(got == "", F.lit(None)).otherwise(got)


def _attr_both_orders(tag: str, key_attr: str, key_val: str,
                      want_attr: str) -> list[str]:
    """The two attribute orders of ``<tag key=val ... want=X>`` as regex
    alternatives; values may be single- or double-quoted."""
    k = f"{key_attr}\\s*=\\s*[\"']{key_val}[\"']"
    w = f"{want_attr}\\s*=\\s*[\"']([^\"']*)[\"']"
    return [f"<{tag}\\b[^>]*{k}[^>]*{w}",
            f"<{tag}\\b[^>]*{w}[^>]*{k}"]


def _unescape(col: Column) -> Column:
    """The standard named entities plus the common numeric spellings of
    quote/apostrophe. ``&amp;`` is replaced LAST so ``&amp;lt;`` decodes
    to the literal ``&lt;`` (single-pass semantics, the HTML5 rule).
    Arbitrary numeric references need a computed char substitution that
    no native expression provides — they pass through untouched, which
    the content extractor (a real parser) handles instead."""
    c = col
    for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
                     ("&#34;", "\""), ("&#39;", "'"), ("&#x27;", "'"),
                     ("&apos;", "'"), ("&nbsp;", " ")):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.replace(c, F.lit("&amp;"), F.lit("&"))


def _clean_text(col: Column) -> Column:
    return F.nullif(F.trim(F.regexp_replace(_unescape(col), r"\s+", " ")),
                    F.lit(""))


def page_meta(html_col) -> dict[str, Column]:
    """Column expressions for the standard head metadata of an HTML page.

    ``html_col`` may be a string/binary column or name; binary is decoded
    as UTF-8 with replacement (crawl payloads are not always valid UTF-8).
    Returns a dict of NULLABLE string columns: ``title``,
    ``meta_description``, ``og_title``, ``og_description``, ``og_type``,
    ``canonical_url``, ``html_lang``, ``published_time``.
    """
    c = html_col if isinstance(html_col, Column) else F.col(html_col)
    # binary -> string cast is validation-free; make_valid_utf8 then swaps
    # invalid sequences for U+FFFD (decode() would THROW under ANSI, and a
    # crawl always carries some mis-declared charsets)
    h = F.make_valid_utf8(c.cast("string"))

    def first_of(pats: list[str]) -> Column:
        out = _first(h, pats[0])
        for p in pats[1:]:
            out = F.coalesce(out, _first(h, p))
        return out

    def meta_named(name: str) -> Column:
        return first_of(_attr_both_orders("meta", "name", name, "content"))

    def meta_prop(prop: str) -> Column:
        return first_of(_attr_both_orders("meta", "property", prop, "content"))

    return {
        "title": _clean_text(_first(h, r"<title\b[^>]*>([^<]*)</title\s*>")),
        "meta_description": _clean_text(meta_named("description")),
        "og_title": _clean_text(meta_prop("og:title")),
        "og_description": _clean_text(meta_prop("og:description")),
        "og_type": _clean_text(meta_prop("og:type")),
        # canonical href is a URL: entity-unescape (&amp; in query strings)
        # but do NOT whitespace-squash interior bytes — trim only
        "canonical_url": F.nullif(F.trim(_unescape(first_of(
            _attr_both_orders("link", "rel", "canonical", "href")))),
            F.lit("")),
        "html_lang": F.lower(_first(
            h, r"<html\b[^>]*\blang\s*=\s*[\"']([A-Za-z0-9-]+)[\"']")),
        "published_time": _clean_text(F.coalesce(
            meta_prop("article:published_time"),
            meta_named("date"),
            _first(h, r"<time\b[^>]*\bdatetime\s*=\s*[\"']([^\"']*)[\"']"))),
    }


def with_page_meta(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """pages + the ``page_meta`` columns — one map-only projection that
    Catalyst folds into the scan stage (no shuffle, no Python)."""
    df = pages
    for name, col in page_meta(html_col).items():
        df = df.withColumn(name, col)
    return df
