"""Validation (J4/J5) and snapshot-hash scheme tests."""

import json
import os

import pytest

from pdfextractor_spark.extraction.report import build_structured_report
from pdfextractor_spark.extraction.sections import extract_sections
from pdfextractor_spark.extraction.snapshot import build_snapshot, diff_snapshots, js_num_str
from pdfextractor_spark.validation import (
    accuracy_lists,
    evaluate_set,
    evaluate_set_spark,
    false_pos_rate,
    metric_value_accuracy,
    run_validation,
)

GOLDEN_SNAP = os.path.join(os.path.dirname(__file__), "golden", "costsnap_booths.json")


def test_evaluate_set_prf1():
    r = evaluate_set(["Reduce Sediment 25%", "Install Fencing"],
                     ["reduce sediment 25%", "install fencing", "bogus entry"])
    assert r["tp"] == 2 and r["fp"] == 1 and r["fn"] == 0
    assert r["precision"] == pytest.approx(2 / 3)
    assert r["recall"] == 1.0


def test_evaluate_set_empty_edge_cases():
    assert evaluate_set([], [])["precision"] == 1.0
    assert evaluate_set(["x"], [])["recall"] == 0.0
    assert evaluate_set([], ["y"])["precision"] == 0.0


def test_accuracy_lists_greedy_used_set():
    golden = [{"title": "A"}, {"title": "A"}, {"title": "B"}]
    produced = [{"title": "A"}, {"title": "B"}]
    # second golden 'A' cannot reuse the single produced 'A'
    assert accuracy_lists(golden, produced, ["title"]) == pytest.approx(2 / 3)


def test_run_validation_gate():
    golden = {"goals": [{"title": "g"}], "bmps": [{"name": "b"}], "monitoring": [{"metric": "m"}]}
    ok = run_validation({"goals": [{"title": "g"}], "bmps": [{"name": "b"}],
                         "monitoring": [{"metric": "m"}]}, golden)
    assert ok["meetsThresholds"]
    fp = run_validation({"goals": [{"title": "g"}, {"title": "extra"}],
                         "bmps": [{"name": "b"}], "monitoring": [{"metric": "m"}]}, golden)
    assert not fp["meetsThresholds"]  # zero-FP rule
    assert fp["falsePositives"]["goals"] == 0.5


def test_metric_value_accuracy_tolerance():
    r = metric_value_accuracy(["Turbidity 40 ppm"], ["Turbidity 40.3 ppm"], value_tol=0.01)
    assert r["matched"] == 1 and r["valueMatches"] == 1
    r2 = metric_value_accuracy(["Turbidity 40 ppm"], ["Turbidity 45 ppm"], value_tol=0.01)
    assert r2["matched"] == 1 and r2["valueMatches"] == 0


def test_evaluate_set_spark_matches_local(spark):
    gold = spark.createDataFrame([("Reduce Sediment 25%",), ("Install Fencing",)], ["name"])
    prod = spark.createDataFrame([("reduce sediment 25%",), ("bogus",)], ["name"])
    row = evaluate_set_spark(gold, prod, "name").first()
    assert (row["tp"], row["fp"], row["fn"]) == (1, 1, 1)


def test_js_num_str():
    assert js_num_str(81350.0) == "81350"
    assert js_num_str(18689.2) == "18689.2"
    assert js_num_str(None) == ""


BOOTHS_TEXT = "\n".join([
    "Provided below is an estimate of project BMP costs.",
    "Code Practice Units Cost Estimated Units Total",
    "314 Brush Management ac $44.70 500 $22,350.00",
    "342 Critical Area Planting ac $120.00 200 $24,000.00",
    "382 Fencing ft $2.50 10,000 $25,000.00",
    "560 Access Road ft $5.00 2,000 $10,000.00",
    "Total $81,350.00",
])


def _booths_snapshot():
    rep = build_structured_report(extract_sections(BOOTHS_TEXT), source_id="booths-fixture",
                                  source_file="booths-fixture", raw_text=BOOTHS_TEXT)
    return build_snapshot(rep)


def test_snapshot_matches_committed_golden():
    snap = _booths_snapshot()
    with open(GOLDEN_SNAP) as f:
        golden = json.load(f)
    assert snap == golden  # sha1-pinned regression, reference scheme


def test_snapshot_diff_classification():
    old = _booths_snapshot()
    new = json.loads(json.dumps(old))
    new["tables"][0]["rowCount"] = 99
    new["tables"][0]["hash"] = "deadbeef"
    new["combinedHash"] = "changed"
    diffs = diff_snapshots(old, new)
    assert any(d.startswith("CHANGED") and "rowCount" in d for d in diffs)
    assert "CHANGED combinedHash" in diffs
    del new["tables"][1:]
    diffs2 = diff_snapshots(old, new)
    assert any(d.startswith("REMOVED") for d in diffs2)
