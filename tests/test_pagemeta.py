"""HTML head-metadata extraction (ops/pagemeta.py).

Crafted-page cases for each field, the browser-parity rules (first
occurrence wins, both attribute orders, single/double quoting), the
single-pass entity unescape, and the map-only plan contract.
"""

import pyspark.sql.functions as F


def _meta(spark, html, binary=False):
    from pdfextractor_spark.ops.pagemeta import with_page_meta

    if binary:
        df = spark.createDataFrame([(html,)], "html binary")
    else:
        df = spark.createDataFrame([(html,)], "html string")
    return with_page_meta(df).collect()[0].asDict()


FULL_PAGE = """<!DOCTYPE html>
<html lang="EN-us">
<head>
  <title> A &amp; B &lt;pilot&gt;
     page </title>
  <meta name="description" content="First   desc &quot;quoted&quot;.">
  <meta property="og:title" content='OG title'>
  <meta content='og description here' property="og:description">
  <meta property="og:type" content="article">
  <link rel="canonical" href="https://ex.com/a?x=1&amp;y=2">
  <meta property="article:published_time" content="2021-03-04T05:06:07Z">
</head>
<body><title>second title ignored</title></body>
</html>"""


def test_full_page_all_fields(spark):
    m = _meta(spark, FULL_PAGE)
    assert m["title"] == 'A & B <pilot> page'          # unescape + squash
    assert m["meta_description"] == 'First desc "quoted".'
    assert m["og_title"] == "OG title"                 # single quotes
    assert m["og_description"] == "og description here"  # reversed attr order
    assert m["og_type"] == "article"
    assert m["canonical_url"] == "https://ex.com/a?x=1&y=2"
    assert m["html_lang"] == "en-us"                   # lowercased
    assert m["published_time"] == "2021-03-04T05:06:07Z"


def test_missing_fields_are_null_not_empty(spark):
    m = _meta(spark, "<html><body>no head metadata at all</body></html>")
    for k in ("title", "meta_description", "og_title", "og_description",
              "og_type", "canonical_url", "html_lang", "published_time"):
        assert m[k] is None, k


def test_empty_title_is_null(spark):
    assert _meta(spark, "<html><title>   </title></html>")["title"] is None


def test_first_title_wins(spark):
    m = _meta(spark, "<title>one</title><title>two</title>")
    assert m["title"] == "one"


def test_amp_unescape_is_single_pass(spark):
    # HTML5 single-pass: &amp;lt; decodes to the literal "&lt;", not "<"
    m = _meta(spark, "<title>x &amp;lt; y</title>")
    assert m["title"] == "x &lt; y"


def test_published_time_fallback_order(spark):
    only_date = '<meta name="date" content="2020-01-02">'
    only_time_tag = '<time datetime="2019-09-09T00:00:00">then</time>'
    both = ('<meta property="article:published_time" content="2022-02-02">'
            + only_date + only_time_tag)
    assert _meta(spark, only_date)["published_time"] == "2020-01-02"
    assert _meta(spark, only_time_tag)["published_time"] == "2019-09-09T00:00:00"
    assert _meta(spark, both)["published_time"] == "2022-02-02"


def test_canonical_keeps_interior_bytes(spark):
    # entity-unescaped but NOT whitespace-squashed inside the URL
    m = _meta(spark, '<link href="  /a%20b?q=1&amp;r=2 " rel="canonical">')
    assert m["canonical_url"] == "/a%20b?q=1&r=2"


def test_binary_html_with_invalid_utf8(spark):
    raw = b"<html lang='fr'><title>caf\xc3\xa9 \xff ok</title></html>"
    m = _meta(spark, raw, binary=True)
    assert m["html_lang"] == "fr"
    assert m["title"].startswith("café ")
    assert m["title"].endswith(" ok")  # bad byte replaced, not fatal


def test_unquoted_attr_falls_back_to_null(spark):
    # explicit caveat from the module docstring: unquoted values -> NULL
    m = _meta(spark, "<meta name=description content=plain>")
    assert m["meta_description"] is None


def test_plan_is_map_only_no_python(spark):
    from pdfextractor_spark.ops.pagemeta import with_page_meta

    df = spark.range(8).select(
        F.concat(F.lit("<html lang='en'><title>t"), F.col("id").cast("string"),
                 F.lit("</title></html>")).alias("html"))
    plan = with_page_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
