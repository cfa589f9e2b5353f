"""WARC ingestion source (sources/warc.py): ISO 28500 record parsing,
Common Crawl's per-record-gzip framing, and the Spark binaryFile path
into PAGES_SCHEMA — including the downstream extraction pipeline."""

import gzip

from pdfextractor_spark.sources.warc import make_warc, parse_warc, read_warc

RECORDS = [
    {"url": "http://a.example/page1", "date": "2024-03-05T12:30:00Z",
     "body": b"<html><body><p>" + b"Paragraph one with enough prose to keep. " * 3
             + b"</p></body></html>"},
    {"url": "http://b.example/doc.pdf", "date": "2024-03-06T01:02:03Z",
     "body": b"%PDF-1.4 fake", "http_content_type": "application/pdf"},
]


def test_parse_roundtrip_plain_and_gzipped():
    for per_gz in (False, True):
        blob = make_warc(RECORDS, per_record_gzip=per_gz)
        recs = list(parse_warc(blob))
        assert [r["url"] for r in recs] == [r["url"] for r in RECORDS]
        assert [r["body"] for r in recs] == [r["body"] for r in RECORDS]
        assert recs[1]["http_content_type"] == "application/pdf"
        assert all(r["type"] == "response" for r in recs)


def test_parse_skips_non_response_and_whole_file_gzip():
    info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
            "abcd\r\n\r\n").encode()
    blob = info + make_warc(RECORDS[:1])
    recs = list(parse_warc(blob))
    assert recs[0]["type"] == "warcinfo" and recs[1]["type"] == "response"
    # a whole-file gzip (not per-record) inflates identically
    assert [r["url"] for r in parse_warc(gzip.compress(blob))] == \
        [None, "http://a.example/page1"]


def test_read_warc_into_pages_and_extract(spark, tmp_path):
    d = tmp_path / "cc"
    d.mkdir()
    (d / "seg-00000.warc.gz").write_bytes(make_warc(RECORDS, per_record_gzip=True))
    (d / "seg-00001.warc").write_bytes(make_warc(
        [{"url": "http://c.example/x", "date": "2024-04-01T00:00:00Z",
          "body": b"<html><p>" + b"More readable text for the stripper. " * 4
          + b"</p></html>"}]))
    (d / "seg-corrupt.warc").write_bytes(b"GARBAGE NOT A WARC FILE\r\n\r\nxx")

    pages = read_warc(spark, str(d / "*.warc*"))
    rows = {r["url"]: r for r in pages.collect()}
    assert len(rows) == 4  # 3 pages + 1 per-file error row
    assert rows["http://a.example/page1"]["warc_ts"].month == 3
    assert bytes(rows["http://b.example/doc.pdf"]["html"]) == b"%PDF-1.4 fake"
    err = rows["warc_error:" + [u for u in rows if u.startswith("warc_error:")][0][11:]]
    assert "ValueError" in err["text"]

    # the ingested table feeds the extraction pipeline unchanged
    from pdfextractor_spark.pipeline.fused import extract_fused

    good = pages.where("html is not null")
    silver = {r["url"]: r for r in extract_fused(good, num_partitions=2).collect()}
    assert silver["http://a.example/page1"]["parser"] == "html"
    assert silver["http://a.example/page1"]["n_chars"] > 50
    assert silver["http://c.example/x"]["parser"] == "html"
    # the fake PDF payload routes down the pdf branch -> per-row error
    assert silver["http://b.example/doc.pdf"]["error"] is not None


def test_wet_export_round_trips_through_parse_warc(spark, tmp_path):
    import datetime as dt

    from pdfextractor_spark.sources.warc import parse_warc, wet_records, write_wet

    rows = [
        ("https://a.com/x", dt.datetime(2024, 3, 1, 12, 0, 0), "Hello WET.\nLine two."),
        ("https://b.org/y", None, "Unicode: éclair 日本語"),
        ("https://c.net/z", dt.datetime(2023, 7, 4), ""),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    # member-level round trip: concatenated members parse as conversion records
    members = {r["url"]: bytes(r["wet"]) for r in wet_records(df).collect()}
    blob = b"".join(members[u] for u, _, _ in rows)
    recs = list(parse_warc(blob))
    assert [r["type"] for r in recs] == ["conversion"] * 3
    got = {r["url"]: r["body"].decode("utf-8") for r in recs}
    for url, _ts, text in rows:
        assert got[url] == text
    assert recs[0]["date"] == "2024-03-01T12:00:00Z"
    # file-level: write per-partition .wet.gz files and re-parse them all
    out_dir = str(tmp_path / "wet")
    files = write_wet(df.repartition(2), out_dir)
    assert files and all(f.endswith(".warc.wet.gz") for f in files)
    parsed = {}
    for f in files:
        with open(f, "rb") as fh:
            for r in parse_warc(fh.read()):
                parsed[r["url"]] = r["body"].decode("utf-8")
    assert parsed == {u: t for u, _ts, t in rows}


def test_wet_export_unicode_and_hostile_urls(spark, tmp_path):
    import os

    from pdfextractor_spark.sources.warc import parse_warc, wet_records, write_wet

    rows = [
        ("https://example.com/日本語/ページ", None, "unicode path doc"),
        ("https://evil.com/x\r\nWARC-Type: injected", None, "crlf doc"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    blob = b"".join(bytes(r["wet"]) for r in wet_records(df).collect())
    recs = list(parse_warc(blob))
    assert len(recs) == 2 and all(r["type"] == "conversion" for r in recs)
    by_body = {r["body"].decode("utf-8"): r for r in recs}
    # unicode URI round-trips; control chars are stripped, not injected
    assert by_body["unicode path doc"]["url"] == "https://example.com/日本語/ページ"
    assert by_body["crlf doc"]["url"] == "https://evil.com/xWARC-Type: injected"
    # empty partitions leave no zero-byte invalid gzip files behind
    out_dir = str(tmp_path / "wet2")
    files = write_wet(df.repartition(8), out_dir)
    on_disk = sorted(os.listdir(out_dir))
    assert sorted(os.path.basename(f) for f in files) == on_disk
    assert all(os.path.getsize(os.path.join(out_dir, f)) > 0 for f in on_disk)


def test_wet_records_carry_mandatory_record_id(spark):
    # WARC-Record-ID is mandatory on every WARC 1.0 record (and CC WET
    # carries WARC-Refers-To); ids must be deterministic so re-exports are
    # byte-stable
    import datetime as dt
    import re

    from pdfextractor_spark.sources.warc import parse_warc, wet_records

    rows = [("https://a.com/x", dt.datetime(2024, 3, 1, 12, 0, 0), "body one"),
            ("https://b.org/y", None, "body two")]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    blobs1 = {r["url"]: bytes(r["wet"]) for r in wet_records(df).collect()}
    blobs2 = {r["url"]: bytes(r["wet"]) for r in wet_records(df).collect()}
    assert blobs1 == blobs2  # deterministic bytes, including the uuids
    urn = re.compile(r"^<urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-"
                     r"[0-9a-f]{4}-[0-9a-f]{12}>$")
    ids = set()
    for blob in blobs1.values():
        (rec,) = parse_warc(blob)
        assert rec["record_id"] and urn.match(rec["record_id"]), rec["record_id"]
        ids.add(rec["record_id"])
        # WARC-Refers-To present and distinct from the record id
        import gzip as _gz
        head = _gz.decompress(blob).split(b"\r\n\r\n", 1)[0].decode()
        m = re.search(r"WARC-Refers-To: (<urn:uuid:[0-9a-f-]{36}>)", head)
        assert m and m.group(1) != rec["record_id"]
    assert len(ids) == 2  # unique per document
