"""S7 gold export: CSV/JSON per report (ref: backend/routes/export.js:27-38,
backend/utils/toCSV.js:1-12)."""

import json
import os

from pdfextractor_spark.pipeline.export import (
    export_gold_files,
    gold_export_strings,
    report_to_csv,
)


def _silver(spark, n=12):
    from pdfextractor_spark.corpus import generate_pages
    from pdfextractor_spark.pipeline.fused import extract_fused
    from pdfextractor_spark.pipeline.schema import PAGES_SCHEMA

    pages = spark.createDataFrame(generate_pages(n), schema=PAGES_SCHEMA)
    return extract_fused(pages, num_partitions=4)


def test_csv_matches_reference_flattening(spark):
    silver = _silver(spark)
    rows = gold_export_strings(silver).collect()
    assert rows
    checked = 0
    for r in rows:
        report = json.loads(r["json"]) if r["json"] else {}
        assert r["csv"].splitlines()[0] == "Section,ID,Field1,Field2,Field3"
        expected = report_to_csv(report)
        assert r["csv"] == expected
        if report.get("goals") or report.get("bmps"):
            checked += 1
            assert len(r["csv"].splitlines()) == 1 + len(report.get("goals") or []) + len(report.get("bmps") or [])
    assert checked > 0


def test_export_files_round_trip(spark, tmp_path):
    silver = _silver(spark, n=8)
    n = export_gold_files(silver, str(tmp_path))
    files = sorted(os.listdir(tmp_path))
    assert n == silver.count()
    assert len([f for f in files if f.endswith(".csv")]) == n
    assert len([f for f in files if f.endswith(".json")]) == n
    # JSON round-trips to a structured report with the expected sections
    j = json.load(open(os.path.join(tmp_path, [f for f in files if f.endswith(".json")][0])))
    assert "goals" in j and "bmps" in j and "summary" in j
