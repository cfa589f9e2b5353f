"""S8 Excel export: minimal OOXML writer round-trip.

Validates the workbook structurally (zipfile + ElementTree — no xlsx reader
ships in this container): part inventory, sheet names/order, bold header
style, reference column widths, inline-string and numeric cell values
(ref: backend/scripts/exportExcel.js:44-110)."""

import json
import os
import zipfile
import xml.etree.ElementTree as ET

import pytest

from pdfextractor_spark.pipeline.xlsx import (
    report_to_sheets,
    write_xlsx,
)

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _sheet_cells(zf: zipfile.ZipFile, part: str) -> dict:
    """{cell_ref: (value, style)} with inline strings and numbers decoded."""
    root = ET.fromstring(zf.read(part))
    out = {}
    for c in root.iter(f"{{{NS['m']}}}c"):
        ref = c.get("r")
        t = c.get("t")
        if t == "inlineStr":
            val = "".join(e.text or "" for e in c.iter(f"{{{NS['m']}}}t"))
        else:
            v = c.find("m:v", NS)
            val = None if v is None else float(v.text)
        out[ref] = (val, c.get("s"))
    return out


@pytest.fixture(scope="module")
def sample_report():
    from pdfextractor_spark.corpus import generate_pages
    from pdfextractor_spark.pipeline.bronze import _extract_one
    from pdfextractor_spark.pipeline.silver import build_report_row

    for r in generate_pages(80, seed=42):
        raw, _parser, _n, _err, _enc = _extract_one(r["html"], r["text"])
        rep = json.loads(build_report_row(r["url"], r["lang"], raw)["report_json"])
        if rep.get("goals") and rep.get("bmps"):
            return rep
    raise AssertionError("corpus yielded no report with goals+bmps")


def test_workbook_parts_and_sheets(tmp_path, sample_report):
    path = str(tmp_path / "report.xlsx")
    write_xlsx(path, report_to_sheets(sample_report, "2026-01-01T00:00:00Z"),
               created="2026-01-01T00:00:00Z")
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
                "xl/_rels/workbook.xml.rels", "xl/styles.xml",
                "docProps/core.xml"} <= names
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheet_names = [s.get("name") for s in wb.iter(f"{{{NS['m']}}}sheet")]
        assert sheet_names == ["Metadata", "Summary", "Goals", "BMPs",
                               "Implementation", "Monitoring", "Outreach",
                               "Geography"]
        # every sheet part exists and parses
        for i in range(1, 9):
            assert f"xl/worksheets/sheet{i}.xml" in names


def test_cell_values_and_header_style(tmp_path, sample_report):
    path = str(tmp_path / "report.xlsx")
    write_xlsx(path, report_to_sheets(sample_report, "2026-01-01T00:00:00Z"))
    with zipfile.ZipFile(path) as zf:
        goals = _sheet_cells(zf, "xl/worksheets/sheet3.xml")
        # header row bold (style 1 = bold xf), reference field order
        for col, name in zip("ABCDEF",
                             ["id", "title", "status", "targetValue",
                              "unit", "source"]):
            val, style = goals[f"{col}1"]
            assert val == name and style == "1"
        g0 = sample_report["goals"][0]
        assert goals["A2"] == (g0["id"], None)
        assert goals["B2"][0] == g0["title"]
        if g0.get("targetValue") is not None:
            assert goals["D2"][0] == pytest.approx(g0["targetValue"])
        # Summary sheet numeric round-trip
        summary = _sheet_cells(zf, "xl/worksheets/sheet2.xml")
        assert summary["A2"][0] == "totalGoals"
        assert summary["B2"][0] == len(sample_report["goals"])
        # Metadata counts row matches
        meta = _sheet_cells(zf, "xl/worksheets/sheet1.xml")
        meta_pairs = {}
        r = 1
        while f"A{r}" in meta or r <= 2:
            if f"A{r}" in meta:
                meta_pairs[meta[f"A{r}"][0]] = meta.get(f"B{r}", (None, None))[0]
            r += 1
        assert meta_pairs["goals.count"] == len(sample_report["goals"])
        assert meta_pairs["bmps.count"] == len(sample_report["bmps"])
        assert meta_pairs["exportedAt"] == "2026-01-01T00:00:00Z"


def test_column_widths_match_reference_formula(tmp_path):
    header = ["id", "a-very-long-header-name-that-exceeds-sixty-characters-" * 2,
              "status"]
    path = str(tmp_path / "w.xlsx")
    write_xlsx(path, [("S", header, [])])
    with zipfile.ZipFile(path) as zf:
        root = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
        widths = [int(c.get("width")) for c in root.iter(f"{{{NS['m']}}}col")]
    # ref: min(60, max(12, len+2))
    assert widths == [12, 60, min(60, max(12, len(header[2]) + 2))]


def test_escaping_and_illegal_chars(tmp_path):
    rows = [["a<b>&\"'", "tab\tok", "ctrl\x01gone", " pad "]]
    path = str(tmp_path / "esc.xlsx")
    write_xlsx(path, [("S", ["w", "x", "y", "z"], rows)])
    with zipfile.ZipFile(path) as zf:
        cells = _sheet_cells(zf, "xl/worksheets/sheet1.xml")
    assert cells["A2"][0] == "a<b>&\"'"
    assert cells["B2"][0] == "tab\tok"
    assert cells["C2"][0] == "ctrlgone"
    assert cells["D2"][0] == " pad "  # xml:space preserved


def test_duplicate_sheet_names_rejected(tmp_path):
    with pytest.raises(ValueError):
        write_xlsx(str(tmp_path / "d.xlsx"), [("S", ["a"], []),
                                              ("S", ["b"], [])])


def test_export_gold_xlsx_distributed(spark, tmp_path):
    from pdfextractor_spark.corpus import generate_pages
    from pdfextractor_spark.pipeline.bronze import extract_bronze
    from pdfextractor_spark.pipeline.schema import PAGES_SCHEMA
    from pdfextractor_spark.pipeline.silver import extract_silver
    from pdfextractor_spark.pipeline.xlsx import export_gold_xlsx

    pages = spark.createDataFrame(generate_pages(24, seed=7), schema=PAGES_SCHEMA)
    silver = extract_silver(extract_bronze(pages))
    out = str(tmp_path / "gold_xlsx")
    n = export_gold_xlsx(silver, out, exported_at="2026-01-01T00:00:00Z")
    files = [f for f in os.listdir(out) if f.endswith(".xlsx")]
    assert n == len(files) == 24
    # spot-check one workbook opens and has the 8 sheets
    with zipfile.ZipFile(os.path.join(out, sorted(files)[0])) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        assert len(list(wb.iter(f"{{{NS['m']}}}sheet"))) == 8


REF_SILVER_DIR = "/root/reference/data/silver"


@pytest.mark.skipif(not os.path.isdir(REF_SILVER_DIR),
                    reason="reference corpus not mounted")
def test_export_every_reference_silver_report(tmp_path):
    """Real-corpus smoke: every silver JSON the reference ships exports to
    a structurally valid 8-sheet workbook (entity rows == entity counts,
    all sheet parts parse as XML) — the writer handles every real shape
    (nulls, unicode, large tables), not just the synthetic fixture."""
    import glob

    paths = sorted(glob.glob(os.path.join(REF_SILVER_DIR, "*.json")))
    assert len(paths) >= 60
    entity_sheets = {"Goals": "goals", "BMPs": "bmps",
                     "Implementation": "implementation",
                     "Monitoring": "monitoring", "Outreach": "outreach",
                     "Geography": "geographicAreas"}
    for p in paths:
        rep = json.load(open(p))
        out = tmp_path / (os.path.basename(p) + ".xlsx")
        write_xlsx(str(out), report_to_sheets(rep))
        zf = zipfile.ZipFile(out)
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        names = [s.get("name") for s in wb.iter(f"{{{NS['m']}}}sheet")]
        assert names == ["Metadata", "Summary", "Goals", "BMPs",
                         "Implementation", "Monitoring", "Outreach",
                         "Geography"], p
        for i, name in enumerate(names):
            part = f"xl/worksheets/sheet{i + 1}.xml"
            root = ET.fromstring(zf.read(part))  # well-formed
            if name in entity_sheets:
                n_rows = len(root.findall(f".//{{{NS['m']}}}row")) - 1
                assert n_rows == len(rep.get(entity_sheets[name]) or []), (p, name)
