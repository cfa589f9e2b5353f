"""Validation operators: golden-example accuracy (J4) and P/R/F1 set
evaluation (J5), plus their corpus-scale Spark formulations.

Refs: backend/validation/validate.js:20-59 (greedy key-field matching with a
used-set, false-positive rate, >=0.9 + zero-FP gate) and
backend/validation/evaluate.js:28-78 (normalized-string set P/R/F1, metric
value tolerance).
"""

from __future__ import annotations

import re

from .extraction.textutil import eval_normalize

__all__ = [
    "evaluate_set",
    "accuracy_lists",
    "false_pos_rate",
    "run_validation",
    "metric_value_accuracy",
    "evaluate_set_spark",
]


def _uniq(items):
    seen = []
    for x in items:
        if x and x not in seen:
            seen.append(x)
    return seen


def evaluate_set(gold_arr: list[str], extracted_arr: list[str]) -> dict:
    """Normalized-string set TP/FP/FN + precision/recall/F1 (J5)."""
    gold = _uniq([eval_normalize(s or "") for s in gold_arr])
    extracted = _uniq([eval_normalize(s or "") for s in extracted_arr])
    tp = sum(1 for e in extracted if e in gold)
    fp = len(extracted) - tp
    fn = len(gold) - tp
    precision = tp / len(extracted) if extracted else (0.0 if gold else 1.0)
    recall = tp / len(gold) if gold else 1.0
    f1 = (2 * precision * recall / (precision + recall)) if (precision + recall) else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision, "recall": recall,
            "f1": f1, "goldCount": len(gold), "extractedCount": len(extracted)}


def accuracy_lists(golden_list: list[dict], produced_list: list[dict],
                   key_fields: list[str]) -> float:
    """Greedy inner-join accuracy on exact key fields with a used-set (J4)."""
    correct = 0
    used: set[int] = set()
    for g in golden_list:
        for i, p in enumerate(produced_list):
            if i in used:
                continue
            if all(p.get(f) == g.get(f) for f in key_fields):
                correct += 1
                used.add(i)
                break
    return correct / len(golden_list) if golden_list else 1.0


def false_pos_rate(golden_list: list[dict], produced_list: list[dict], key: str) -> float:
    golden_keys = {g.get(key) for g in golden_list}
    fp = sum(1 for p in produced_list if p.get(key) not in golden_keys)
    return fp / len(produced_list) if produced_list else 0.0


def run_validation(produced: dict, golden: dict, threshold: float = 0.9) -> dict:
    """Full golden-example validation: accuracy >= threshold per category AND
    zero false positives (validate.js:33-59)."""
    goals_acc = accuracy_lists(golden.get("goals") or [], produced.get("goals") or [], ["title"])
    bmps_acc = accuracy_lists(golden.get("bmps") or [], produced.get("bmps") or [], ["name"])
    mon_acc = accuracy_lists(golden.get("monitoring") or [], produced.get("monitoring") or [], ["metric"])
    fp_goals = false_pos_rate(golden.get("goals") or [], produced.get("goals") or [], "title")
    fp_bmps = false_pos_rate(golden.get("bmps") or [], produced.get("bmps") or [], "name")
    fp_mon = false_pos_rate(golden.get("monitoring") or [], produced.get("monitoring") or [], "metric")
    meets = (goals_acc >= threshold and bmps_acc >= threshold and mon_acc >= threshold
             and fp_goals == 0 and fp_bmps == 0 and fp_mon == 0)
    return {
        "goalsAccuracy": goals_acc, "bmpsAccuracy": bmps_acc, "monitoringAccuracy": mon_acc,
        "falsePositives": {"goals": fp_goals, "bmps": fp_bmps, "monitoring": fp_mon},
        "meetsThresholds": meets,
    }


_NUM_RE = re.compile(r"([0-9]+(?:\.[0-9]+)?)")
_UNIT_RE = re.compile(r"(mg/l|mg\\l|cfs|acres?|percent|%|tons?|kg|km)", re.I)


def metric_value_accuracy(gold_metrics: list[str], extracted_metrics: list[str],
                          value_tol: float = 0.01) -> dict:
    """Numeric metric matching with relative tolerance (evaluate.js:55-78)."""

    def parse(line: str) -> dict:
        num = _NUM_RE.search(line)
        unit = _UNIT_RE.search(line)
        return {
            "norm": eval_normalize(_NUM_RE.sub("", line, count=1).strip()),
            "value": float(num.group(1)) if num else None,
            "unit": unit.group(1).lower() if unit else None,
        }

    gold_parsed = [parse(m) for m in gold_metrics]
    extracted_parsed = [parse(m) for m in extracted_metrics]
    matched = value_matches = unit_matches = 0
    for g in gold_parsed:
        cand = next((e for e in extracted_parsed if e["norm"] == g["norm"]), None)
        if cand is None:
            continue
        matched += 1
        if g["value"] is not None and cand["value"] is not None:
            rel = (abs(cand["value"] - g["value"]) if g["value"] == 0
                   else abs(cand["value"] - g["value"]) / g["value"])
            if rel <= value_tol:
                value_matches += 1
        if g["unit"] and cand["unit"] and g["unit"] == cand["unit"]:
            unit_matches += 1
    return {"matched": matched, "valueMatches": value_matches, "unitMatches": unit_matches}


def evaluate_set_spark(gold_df, produced_df, col: str):
    """Corpus-scale J5: P/R/F1 via intersect/except on normalized columns.

    Both inputs are DataFrames with a string column ``col``; returns a
    one-row DataFrame (tp, fp, fn, precision, recall, f1). Normalization is
    the same lowercase/[a-z0-9%]/collapse chain, JVM-side."""
    from pyspark.sql import functions as F

    def norm(df):
        c = F.trim(F.regexp_replace(F.regexp_replace(F.lower(F.col(col)), r"[^a-z0-9% ]+", " "), r"\s+", " "))
        return df.select(c.alias("k")).where("k <> ''").distinct()

    g = norm(gold_df)
    p = norm(produced_df)
    tp = p.intersect(g).count()
    fp = p.exceptAll(p.intersect(g)).count()
    fn = g.exceptAll(g.intersect(p)).count()
    precision = tp / (tp + fp) if (tp + fp) else 1.0
    recall = tp / (tp + fn) if (tp + fn) else 1.0
    f1 = (2 * precision * recall / (precision + recall)) if (precision + recall) else 0.0
    spark = gold_df.sparkSession
    return spark.createDataFrame(
        [(tp, fp, fn, round(precision, 6), round(recall, 6), round(f1, 6))],
        "tp long, fp long, fn long, precision double, recall double, f1 double",
    )
