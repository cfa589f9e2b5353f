"""Deterministic synthetic ``pages`` corpus (Common-Crawl-style).

Schema per BASELINE.json input_hint: ``(url STRING, warc_ts TIMESTAMP,
html BINARY, text STRING, lang STRING)``. Seed-fixed; no external data.

Content shapes follow FIXTURES.md §1: sectioned/unsectioned/truncated/
quantitative/mojibake documents, one document family per cost-table pattern,
BMP-noise docs, HTML-boilerplate docs, and two-column out-of-order PDFs.
Skew knobs: ~1% of documents are 50-100x median size; a small fraction are
corrupt payloads (exercise failure counters).

The ``text`` column carries the expected extracted text for ~60% of rows
(the byte-identical parity column); the pipeline must reproduce it exactly.
"""

from __future__ import annotations

import datetime as _dt
import random

from .sources.html import extract_html_text
from .sources.pdf import extract_pdf_auto, extract_pdf_text, make_pdf

__all__ = ["generate_pages", "PAGES_COLUMNS"]

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]

_EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)


def _body_sectioned(rng: random.Random, i: int) -> list[str]:
    pct = rng.choice([15, 20, 25, 30, 40])
    year = rng.choice([2025, 2026, 2027, 2028])
    acres = rng.choice([100, 200, 300, 500])
    feet = rng.choice(["1,200", "2,500", "5,000"])
    return [
        f"Watershed Management Plan {i}",
        "",
        "Goals",
        f"The overall goal is to reduce sediment by {pct}% in the watershed by {year}.",
        f"Reduce phosphorus from 45 mg/L to 30 mg/L by {year}. Responsible: MDEQ.",
        "",
        "BMPs",
        f"Install riparian buffer along {feet} feet of streambank.",
        "Construct sediment basin near the primary outlet channel.",
        f"Cover crop establishment on {acres} acres annually.",
        "Nutrient management planning for row crop operations.",
        "",
        "Implementation",
        f"Monitor water quality quarterly through {year}.",
        "Construct fencing for livestock exclusion in 2024.",
        "Conduct landowner training workshops annually.",
        "",
        "Monitoring",
        "Total suspended solids concentration at station WQ-1",
        "Dissolved oxygen profiles in the main stem",
        "",
        "Outreach",
        "Community workshops for the general public",
        "School programs for local students",
        "",
        "Geography",
        "Upper watershed region near the county line",
    ]


def _body_narrative(rng: random.Random, i: int) -> list[str]:
    pct = rng.choice([10, 20, 35])
    return [
        f"Regional Water Quality Assessment {i}",
        "",
        "This narrative report describes conditions across the basin and the",
        "management measures planned for the coming implementation cycle.",
        f"The primary goal is to reduce nitrogen loading by {pct} percent before 2030.",
        "Landowners will install grassed waterway segments where concentrated flow",
        "causes gully formation, and conservation tillage will be promoted.",
        "Streambank stabilization is planned for the most eroded reaches.",
        "Water monitoring will continue monthly at the established stations.",
    ]


def _body_truncated(rng: random.Random, i: int) -> list[str]:
    return [
        f"Dry Creek Watershed Plan {i}",
        "",
        "Goals",
        "The ultimate goal is to bring about behavior changes and the use of",
        '"best management practices" that will improve water quality and the',
        "overall quality of life in the watershed.",
        "",
        "BMPs",
        "Install livestock exclusion fencing along the riparian corridor.",
    ]


def _body_quantitative(rng: random.Random, i: int) -> list[str]:
    lbs = rng.choice(["1,200", "2,400", "800"])
    return [
        f"Quantitative Targets Report {i}",
        "",
        "Goals",
        f"Reduce sediment by 25% and remove {lbs} lbs/yr of phosphorus loading.",
        "Achieve turbidity improvement from 80 ppm to 40 ppm by 2027.",
        "Lower bacteria counts 30 percent reduction targeted. Lead: County District.",
        "",
        "Monitoring",
        "Continue monthly sampling at all stations",
    ]


def _body_mojibake(rng: random.Random, i: int) -> list[str]:
    return [
        f"Encoding Stress Plan {i}",
        "",
        "Goals",
        "The overall goal is to restore â€œhealthy streamsâ€ and reduce sediment by 20% by 2026.",
        "Our goal is to protect the communityâ€™s water supply â€“ a shared resource.",
    ]


def _body_booths(rng: random.Random, i: int) -> list[str]:
    return [
        f"Booths-Style Cost Plan {i}",
        "",
        "Provided below is an estimate of project BMP costs.",
        "Code Practice Units Cost Estimated Units Total",
        "314 Brush Management ac $44.70 500 $22,350.00",
        "342 Critical Area Planting ac $120.00 200 $24,000.00",
        "382 Fencing ft $2.50 10,000 $25,000.00",
        "560 Access Road ft $5.00 2,000 $10,000.00",
        "Total $81,350.00",
        "",
        "Goals",
        "The primary goal is to reduce sediment delivery by 15% by 2026.",
    ]


def _body_bell(rng: random.Random, i: int) -> list[str]:
    return [
        f"Bell-Style Budget Plan {i}",
        "",
        "Practice Area Affected BMP Cost BMP Total",
        "Streambank and Shoreline Protection 2,500 feet $69.17/ft $172,904",
        "Grade Stabilization Structures 12 structures $10,000/ea $120,000",
        "Pasture Planting 150 acres $180.00/ac $27,000",
        "Total",
        "$319,904",
        "",
        "Table 8.2 Technical Assistance",
        "Item Cost",
        "Project Coordinator $85,000.00",
        "Water Quality Technician $45,000.00",
        "Total $130,000.00",
        "",
        "Goals",
        "The overall goal is to improve dissolved oxygen to attain 5 mg/L by 2028.",
    ]


def _body_phase1(rng: random.Random, i: int) -> list[str]:
    return [
        f"Phase 1 Implementation Plan {i}",
        "",
        "BMPs Amount Estimated Cost",
        "Grade Stabilization Structure (med. Flow/med. Fill) 25 each $235,550",
        "Sediment Basins 10 each $85,000",
        "Critical Area Planting 120 ac $36,000",
        "Total Phase 1 $356,550",
        "",
        "Activity Size Amount Estimated Cost Landowner Match",
        "Fencing 10,000 ft @ $2.50 $25,000 $5,000",
        "Ponds 8 each @ $4,500 $36,000 $7,200",
        "Nutrient Management 400 ac @ $30 $12,000 $2,400",
        "Total Estimated Project Cost $73,000 $14,600",
        "",
        "Goals",
        "The goal is to achieve a 20% reduction of sediment by 2027.",
    ]


def _body_multifund(rng: random.Random, i: int) -> list[str]:
    return [
        f"Multi-Funding Allocation Plan {i}",
        "",
        "Practice Producer NRCS EPA-MDEQ Total",
        "Cover Crops $ 12,000 $ 24,000 $ 12,000 $ 48,000",
        "Grade Stabilization $ 5,000 $ 15,000 $ - $ 20,000",
        "Heavy Use Area Protection $ 2,500 $ 7,500 $ 2,000 $ 12,000",
        "Totals $ 19,500 $ 46,500 $ 14,000 $ 80,000",
        "",
        "Practice Average Unit NRCS Cost Units Total Cost",
        "Critical Area Planting $248.10 32 acres $7,939.20",
        "Fencing $2.15 5,000 ft $10,750.00",
        "TOTAL $18,689.20",
        "",
        "Goals",
        "The overall goal is to reduce nutrient loading 25% by 2029.",
    ]


def _body_impl_budget(rng: random.Random, i: int) -> list[str]:
    return [
        f"Watershed Implementation Plan {i}",
        "",
        "WATERSHED IMPLEMENTATION PLAN – BUDGET ESTIMATES",
        "I. Agricultural Practices",
        "A1. Install cover crops on priority fields $45,000",
        "A2. Establish grassed waterways $30,000",
        "A3. Nutrient management plans $15,000",
        "Subtotal: $90,000",
        "II. Streambank Work",
        "B1. Stabilize eroding banks $120,000",
        "B2. Riparian buffer planting $40,000",
        "B3. Grade control structures $60,000",
        "Subtotal: $220,000",
        "",
        "Goals",
        "The primary objective is to reduce sediment by 30% by 2028.",
    ]


def _body_noise(rng: random.Random, i: int) -> list[str]:
    return [
        f"Schedule and Noise Document {i}",
        "",
        "BMPs",
        "Months 1 - 12",
        "Phase 2",
        "2020 - 2024",
        "PROJECT SCHEDULE OVERVIEW",
        "Total Estimated Cost",
        "Install streambank stabilization along priority reaches",
        "25% of fields",
        "",
        "These BMPs include the following practices:",
        "• Cover Crops",
        "• Grassed Waterways",
        "• Sediment Basins",
        "• Livestock Exclusion Fencing",
        "",
        "Goals",
        "The main goal is to restore riparian buffers and reduce erosion 15% by 2026.",
    ]


def _body_adaptive(rng: random.Random, i: int) -> list[str]:
    return [
        f"Unlabeled Cost Cluster Report {i}",
        "",
        "Watershed coordination and planning $18,500",
        "Riparian planting materials $22,000",
        "Equipment rental for basin construction $31,750",
        "Outreach materials and events $9,800",
        "Laboratory analysis services $14,200",
        "",
        "Small purchases follow.",
        "Stakes and flagging $450",
        "Field notebooks $120",
        "Sample bottles $300",
        "",
        "Goals",
        "The goal is to decrease turbidity 10% by 2026.",
    ]


def _body_plain(rng: random.Random, i: int) -> list[str]:
    return [
        f"General Basin Notes {i}",
        "",
        "These notes describe field observations collected during the spring",
        "site visits and summarize conversations with participating landowners",
        "about conservation practice adoption and maintenance schedules.",
        "No specific numeric targets are established in this memorandum.",
    ]


_SHAPES = [
    _body_sectioned,
    _body_narrative,
    _body_truncated,
    _body_quantitative,
    _body_mojibake,
    _body_booths,
    _body_bell,
    _body_phase1,
    _body_multifund,
    _body_impl_budget,
    _body_noise,
    _body_adaptive,
    _body_plain,
]

_FILLER = (
    "Additional appendix narrative describing soils, hydrology, land use history, "
    "and prior conservation program participation across the contributing area."
)

_PROSE = [
    "Field notes from the spring site visits describe channel conditions and bank stability.",
    "Soil survey data indicate predominantly silty loam textures across the upland areas.",
    "Historic land use in the contributing area was row crop agriculture with scattered pasture.",
    "Participating landowners reported routine maintenance of previously installed practices.",
    "Hydrologic records show flashy storm response typical of modified drainage networks.",
    "Vegetation surveys documented early successional species along the riparian corridor.",
    "Program staff coordinated with the local conservation district on outreach materials.",
    "Stream habitat assessments were completed at representative reaches during base flow.",
    "Aerial imagery review identified several headcut locations advancing through pasture.",
    "Precipitation during the assessment period was near the long-term seasonal average.",
]


def _appendix(rng: random.Random, i: int) -> list[str]:
    """Deterministic prose appendix sized like real web-page body text
    (~4-10 KB/doc). Contains no goal/BMP/cost trigger tokens, so it never
    changes entity extraction results — only document size realism."""
    n = rng.randint(35, 80)
    out = ["", f"Appendix A. Supporting narrative for document {i}.", ""]
    for k in range(n):
        out.append(f"{_PROSE[(i + k) % len(_PROSE)]} (paragraph {k + 1})")
    return out


def _wrap_html(body_lines: list[str], i: int) -> str:
    paras = "\n".join(
        f"<p>{l}</p>" if l else "<br/>" for l in body_lines
    )
    nav_links = " ".join(f'<a href="/s/{k}">Site Link {k}</a>' for k in range(8))
    related = "".join(f'<li><a href="/r/{k}">Related article {k}</a></li>' for k in range(6))
    return f"""<!DOCTYPE html>
<html><head><title>Doc {i}</title><style>body{{margin:0}}</style>
<script>var tracker={i};</script></head>
<body>
<nav>{nav_links}</nav>
<header><div>Example Watershed Portal — Document {i}</div></header>
<div class="layout">
<aside><ul>{related}</ul><div>Advertisement: call now for low rates and amazing savings!</div></aside>
<article>
{paras}
</article>
</div>
<footer><p>Copyright 2024 Example Portal. All rights reserved. Terms. Privacy.</p></footer>
</body></html>"""


# Charset-mix slice (``generate_pages(charset_mix=True)``): legacy-encoded
# HTML pages with a correct <meta charset> — the WHATWG sniffing path
# (sources/encoding.py) must recover the exact original string for the
# byte-parity column to hold. Sample lines are chosen to be encodable in
# each codec and to DIFFER under a wrong decode (accented/CJK bytes).
_CHARSET_MIX: list[tuple[str, str, str]] = [
    ("cp1252", "windows-1252", "Café résumé — naïve façade für die Prüfung."),
    ("shift_jis", "shift_jis", "流域管理計画の概要と目標について記述する。"),
    ("gbk", "gb2312", "流域管理计划的目标与措施说明。"),
    ("euc_kr", "euc-kr", "유역 관리 계획의 목표와 조치 설명."),
    ("iso8859-7", "iso-8859-7", "Σχέδιο διαχείρισης λεκάνης απορροής."),
    ("cp1251", "windows-1251", "План управления водосборным бассейном."),
]


def _wrap_html_charset(body_lines: list[str], i: int, codec: str,
                       label: str, sample: str) -> tuple[bytes, str]:
    """A legacy-encoded page: same boilerplate shell as _wrap_html plus a
    declared meta charset and one codec-native prose line. Returns
    ``(payload_bytes, html_str)`` where payload decodes back to html_str
    under the WHATWG algorithm (meta prescan hits the label)."""
    paras = "\n".join(f"<p>{l}</p>" if l else "<br/>" for l in body_lines)
    html = f"""<!DOCTYPE html>
<html><head><meta charset="{label}"><title>Doc {i}</title></head>
<body>
<nav><a href="/s/0">Site Link 0</a> <a href="/s/1">Site Link 1</a></nav>
<article>
{paras}
<p>{sample} This localized notice is long enough to pass the content gate.</p>
</article>
<footer><p>Copyright 2024 Example Portal. All rights reserved. Terms. Privacy.</p></footer>
</body></html>"""
    return html.encode(codec), html


def _render_pdf(body_lines: list[str], i: int, two_column: bool) -> bytes:
    pages: list[list[tuple[float, float, str]]] = []
    if two_column:
        # two-column page with an out-of-order content stream: right column
        # items emitted first, interleaved, to exercise y-bucket/x-sort rebuild
        half = (len(body_lines) + 1) // 2
        left, right = body_lines[:half], body_lines[half:]
        items: list[tuple[float, float, str]] = []
        for r, l in enumerate(right):
            if l:
                items.append((330.0, 750.0 - 14 * r, l))
        for r, l in enumerate(left):
            if l:
                items.append((72.0, 750.0 - 14 * r, l))
        # shuffle determinism: reverse-interleave for out-of-order stream
        items = items[::2] + items[1::2]
        pages.append(items)
    else:
        per_page = 45
        for p0 in range(0, len(body_lines), per_page):
            chunk = body_lines[p0 : p0 + per_page]
            items = [(72.0, 750.0 - 14 * r, l) for r, l in enumerate(chunk) if l]
            pages.append(items)
        if not pages:
            pages.append([])
    return make_pdf(pages, compress=(i % 2 == 0))


def generate_pages(n_docs: int, seed: int = 42, start: int = 0,
                   charset_mix: bool = False) -> list[dict]:
    """Generate deterministic page rows for doc ids [start, start+n_docs)
    (list of dicts matching PAGES_COLUMNS). Per-doc seeding makes any id
    range reproducible independently, so generation can be sharded across
    processes.

    ``charset_mix=True`` additionally encodes every third HTML page in a
    rotating legacy charset with a declared ``<meta charset>`` (see
    _CHARSET_MIX) — the WHATWG sniffing path must recover the exact
    original string for the parity column to hold. Off by default so the
    long-pinned corpus invariants (golden yields, bench comparability
    across rounds) are untouched."""
    rows: list[dict] = []
    for i in range(start, start + n_docs):
        rng = random.Random(seed * 1_000_003 + i)
        shape = _SHAPES[i % len(_SHAPES)]
        body = shape(rng, i)
        # Realistic web-page body size: prose appendix for most docs
        # (i % 7 == 0 stays short, keeping size diversity)
        if i % 7 != 0:
            body = body + _appendix(rng, i)
        # Skew tail: ~1% of docs are 50-100x median size
        if i % 101 == 7:
            mult = rng.randint(50, 100)
            body = body + [_FILLER + f" (section {k})" for k in range(mult * 10)]
        lang = "es" if i % 17 == 3 else ("fr" if i % 23 == 5 else "en")
        url = f"https://example.org/plans/doc-{i:07d}"
        ts = _EPOCH + _dt.timedelta(seconds=i * 137 % (365 * 86400))
        # Corrupt payloads exercise failure counters (~1%)
        if i % 97 == 13:
            rows.append({"url": url, "warc_ts": ts, "html": b"%PDF-1.4 \x00\x01corrupt",
                         "text": None, "lang": lang})
            continue
        # Image-only PDFs (no text layer) exercise the needs-OCR bucket
        if i % 89 == 11:
            rows.append({"url": url, "warc_ts": ts,
                         "html": make_pdf([[], []], compress=(i % 2 == 0)),
                         "text": None, "lang": lang})
            continue
        is_pdf = (i % 10) >= 7
        if is_pdf:
            payload = _render_pdf(body, i, two_column=(i % 30 == 9))
            # expected text mirrors the PIPELINE's parser order (pdf-parse
            # primary) so the bronze byte-parity column stays meaningful
            expected = extract_pdf_auto(payload)[0]
        else:
            if charset_mix and i % 3 == 1:
                # i // 3 rotation: i % len would alias with the i % 3 gate
                # and only ever pick two of the six codecs
                codec, label, sample = _CHARSET_MIX[(i // 3) % len(_CHARSET_MIX)]
                try:
                    payload, html = _wrap_html_charset(body, i, codec, label, sample)
                except UnicodeEncodeError:
                    # a body line the codec can't carry: plain utf-8 page
                    html = _wrap_html(body, i)
                    payload = html.encode("utf-8")
            else:
                html = _wrap_html(body, i)
                payload = html.encode("utf-8")
            expected = extract_html_text(html)
        # text parity column present for ~60% of rows
        text = expected if (i % 5) < 3 else None
        rows.append({"url": url, "warc_ts": ts, "html": payload, "text": text, "lang": lang})
    return rows
