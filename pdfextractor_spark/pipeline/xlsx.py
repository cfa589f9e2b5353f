"""Minimal OOXML (.xlsx) multi-sheet workbook writer (S8 Excel export).

Stdlib-only: an .xlsx file is a zip archive of XML parts, so ``zipfile`` +
hand-assembled SpreadsheetML is enough for the reference's export shape —
one workbook per silver report with eight sheets (Metadata, Summary, Goals,
BMPs, Implementation, Monitoring, Outreach, Geography), a bold header row,
and reference-matching column widths (ref: backend/scripts/exportExcel.js:
44-52 ``addSheet`` — width ``min(60, max(12, len(header)+2))``, row 1 bold).

Cells use inline strings (no sharedStrings part) so each worksheet part is
self-contained and the per-report writer stays allocation-light on
executors; numbers are written as native numeric cells.
"""

from __future__ import annotations

import os
import re
import zipfile
from xml.sax.saxutils import escape

__all__ = ["write_xlsx", "report_to_sheets", "export_gold_xlsx"]

_XML_DECL = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
# characters illegal in XML 1.0 (except tab/newline/cr) — strip, don't escape
_ILLEGAL_XML = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")


def _col_letter(idx: int) -> str:
    """1-based column index -> A, B, ..., Z, AA, ..."""
    s = ""
    while idx > 0:
        idx, rem = divmod(idx - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def _cell_xml(ref: str, value, bold: bool) -> str:
    style = ' s="1"' if bold else ""
    if value is None or value == "":
        return ""  # omitted cells read back as blank
    if isinstance(value, bool):
        return f'<c r="{ref}"{style} t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        # repr() keeps float round-trip exactness; ints print bare
        return f'<c r="{ref}"{style}><v>{value!r}</v></c>'
    text = _ILLEGAL_XML.sub("", str(value))
    body = escape(text)
    space = ' xml:space="preserve"' if text != text.strip() else ""
    return (f'<c r="{ref}"{style} t="inlineStr">'
            f"<is><t{space}>{body}</t></is></c>")


def _sheet_xml(header: list, rows: list) -> str:
    cols = "".join(
        f'<col min="{i + 1}" max="{i + 1}" '
        f'width="{min(60, max(12, len(str(h)) + 2))}" customWidth="1"/>'
        for i, h in enumerate(header)
    )
    out = [_XML_DECL, f'<worksheet xmlns="{_NS}">', f"<cols>{cols}</cols>",
           "<sheetData>"]
    for r_i, row in enumerate([header] + list(rows), start=1):
        cells = "".join(
            _cell_xml(f"{_col_letter(c_i + 1)}{r_i}", v, bold=(r_i == 1))
            for c_i, v in enumerate(row)
        )
        out.append(f'<row r="{r_i}">{cells}</row>')
    out.append("</sheetData></worksheet>")
    return "".join(out)


_STYLES = (
    _XML_DECL
    + f'<styleSheet xmlns="{_NS}">'
    # font 0 = default, font 1 = bold (xf 1 below = the header style s="1")
    '<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>'
    '<font><b/><sz val="11"/><name val="Calibri"/></font></fonts>'
    '<fills count="1"><fill><patternFill patternType="none"/></fill></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    '<cellXfs count="2"><xf xfId="0"/>'
    '<xf xfId="0" fontId="1" applyFont="1"/></cellXfs>'
    "</styleSheet>"
)


def write_xlsx(path: str, sheets: list, creator: str = "pdf-extractor",
               created: str | None = None) -> None:
    """Write ``sheets`` = [(name, header, rows), ...] as a workbook.

    ``created`` is an ISO-8601 string for docProps (deterministic exports
    pass a fixed value; ``None`` omits the core-properties part)."""
    names = [s[0] for s in sheets]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate sheet names: {names}")

    sheet_entries = "".join(
        f'<sheet name="{escape(str(n))}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        _XML_DECL + f'<workbook xmlns="{_NS}" xmlns:r="{_NS_REL}">'
        f"<sheets>{sheet_entries}</sheets></workbook>"
    )
    wb_rels = (
        _XML_DECL
        + '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="{_NS_REL}/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        + f'<Relationship Id="rId{len(sheets) + 1}" Type="{_NS_REL}/styles" '
        'Target="styles.xml"/></Relationships>'
    )
    content_types = (
        _XML_DECL
        + '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(sheets))
        )
    )
    root_rel_parts = [
        '<Relationship Id="rId1" '
        f'Type="{_NS_REL}/officeDocument" Target="xl/workbook.xml"/>'
    ]
    core_xml = None
    if created is not None:
        content_types += (
            '<Override PartName="/docProps/core.xml" '
            'ContentType="application/vnd.openxmlformats-package.core-properties+xml"/>'
        )
        root_rel_parts.append(
            '<Relationship Id="rId2" '
            'Type="http://schemas.openxmlformats.org/package/2006/relationships/metadata/core-properties" '
            'Target="docProps/core.xml"/>'
        )
        core_xml = (
            _XML_DECL
            + '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
            'xmlns:dc="http://purl.org/dc/elements/1.1/" '
            'xmlns:dcterms="http://purl.org/dc/terms/" '
            'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">'
            f"<dc:creator>{escape(creator)}</dc:creator>"
            f'<dcterms:created xsi:type="dcterms:W3CDTF">{escape(created)}</dcterms:created>'
            "</cp:coreProperties>"
        )
    content_types += "</Types>"
    root_rels = (
        _XML_DECL
        + '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(root_rel_parts) + "</Relationships>"
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/styles.xml", _STYLES)
        if core_xml is not None:
            zf.writestr("docProps/core.xml", core_xml)
        for i, (_name, header, rows) in enumerate(sheets):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml",
                        _sheet_xml(list(header), rows))


def _blank(v):
    return "" if v is None else v


def report_to_sheets(report: dict, exported_at: str | None = None) -> list:
    """Map a silver report dict to the reference's eight export sheets
    (ref: backend/scripts/exportExcel.js:55-110 — same names, headers, and
    row field order)."""
    rid = report.get("id") or ""
    meta = report.get("metadata") or {}
    meta_rows = [["reportId", rid]]
    if exported_at is not None:
        meta_rows.append(["exportedAt", exported_at])
    if report.get("generatedAt"):
        meta_rows.append(["generatedAt", report["generatedAt"]])
    if meta.get("sourceFile"):
        meta_rows.append(["sourceFile", meta["sourceFile"]])
    for key in ("goals", "bmps", "implementation", "monitoring", "outreach",
                "geographicAreas"):
        meta_rows.append([f"{key}.count", len(report.get(key) or [])])

    s = report.get("summary") or {}
    gs = s.get("goalStatus") or {}
    summary_rows = [
        ["totalGoals", s.get("totalGoals")],
        ["totalBMPs", s.get("totalBMPs")],
        ["completionRate", s.get("completionRate")],
        ["totalActivities", s.get("totalActivities")],
        ["totalMetrics", s.get("totalMetrics")],
        ["goals.completed", gs.get("completed")],
        ["goals.inProgress", gs.get("inProgress")],
        ["goals.planned", gs.get("planned")],
        ["goals.pctCompleted", gs.get("pctCompleted")],
        ["goals.pctInProgress", gs.get("pctInProgress")],
        ["goals.pctPlanned", gs.get("pctPlanned")],
    ] + [[f"bmpCategories.{k}", v]
         for k, v in (s.get("bmpCategories") or {}).items()]

    return [
        ("Metadata", ["key", "value"], meta_rows),
        ("Summary", ["metric", "value"], summary_rows),
        ("Goals", ["id", "title", "status", "targetValue", "unit", "source"],
         [[g.get("id"), g.get("title"), g.get("status"),
           _blank(g.get("targetValue")), _blank(g.get("unit")),
           _blank(g.get("source"))] for g in report.get("goals") or []]),
        ("BMPs", ["id", "name", "category", "keyword", "source"],
         [[b.get("id"), b.get("name"), b.get("category"),
           _blank(b.get("keyword")), _blank(b.get("source"))]
          for b in report.get("bmps") or []]),
        ("Implementation",
         ["id", "description", "date", "target", "achieved", "source"],
         [[i.get("id"), i.get("description"), _blank(i.get("date")),
           _blank(i.get("target")), _blank(i.get("achieved")),
           _blank(i.get("source"))]
          for i in report.get("implementation") or []]),
        ("Monitoring", ["id", "metric", "value", "unit", "source"],
         [[m.get("id"), m.get("metric"), _blank(m.get("value")),
           _blank(m.get("unit")), _blank(m.get("source"))]
          for m in report.get("monitoring") or []]),
        ("Outreach", ["id", "activity", "audience", "source"],
         [[o.get("id"), o.get("activity"), _blank(o.get("audience")),
           _blank(o.get("source"))] for o in report.get("outreach") or []]),
        ("Geography", ["id", "area", "source"],
         [[g.get("id"), g.get("area"), _blank(g.get("source"))]
          for g in report.get("geographicAreas") or []]),
    ]


def export_gold_xlsx(silver, out_dir: str,
                     exported_at: str | None = None) -> int:
    """One ``<slug>.xlsx`` per silver report, written from the executors
    (``foreachPartition`` — no driver collect), mirroring the reference's
    file-per-report gold directory. Returns the number of workbooks."""
    import json

    from .export import _slug_of_url

    os.makedirs(out_dir, exist_ok=True)
    counter = silver.sparkSession.sparkContext.accumulator(0)

    def write_partition(rows):
        for row in rows:
            report = json.loads(row["report_json"] or "{}")
            path = os.path.join(out_dir, f"{_slug_of_url(row['url'])}.xlsx")
            write_xlsx(path, report_to_sheets(report, exported_at),
                       created=exported_at)
            counter.add(1)

    silver.select("url", "report_json").foreachPartition(write_partition)
    return counter.value
