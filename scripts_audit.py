#!/usr/bin/env python3
"""CI coverage-audit gate (reference: audit_mdeq_cost_coverage.js + README
thresholds). Runs the full extraction pipeline over a synthetic corpus and
exits 1 if quality gates fail:

- byte-identical extracted text on EVERY parity row
- cost-table coverage >= 90% on cost-bearing document shapes
- parse failure rate <= 2% (only the injected corrupt payloads)
- entity yield: every non-trivial doc shape produces >= 1 goal

Usage: python scripts_audit.py [n_docs]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from pdfextractor_spark.corpus import generate_pages
from pdfextractor_spark.pipeline.fused import extract_fused
from pdfextractor_spark.pipeline.schema import PAGES_SCHEMA
from pdfextractor_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 520


def main() -> int:
    spark = get_spark(app_name="audit", cores=8)
    pages = spark.createDataFrame(generate_pages(N), schema=PAGES_SCHEMA)
    silver = extract_fused(pages, num_partitions=16).cache()

    # 'empty-text' is the needs-OCR COVERAGE bucket (image-only PDFs that
    # parsed fine but have no text layer — the reference counts these in
    # summarize_extraction_coverage.js, not as failures); the failure-rate
    # gate is about parse FAILURES, i.e. the injected corrupt payloads
    row = silver.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(F.col("error").isNotNull()
                     & (F.col("error") != "empty-text"), 1)
              .otherwise(0)).alias("failures"),
        F.sum(F.when(F.col("error") == "empty-text", 1).otherwise(0))
            .alias("needs_ocr"),
        F.sum(F.when(F.col("text_match"), 1).otherwise(0)).alias("matched"),
        F.sum(F.when(F.col("text_match").isNotNull(), 1).otherwise(0)).alias("parity_rows"),
        F.sum(F.when(F.size("cost_tables") > 0, 1).otherwise(0)).alias("with_cost"),
        F.sum(F.when(F.col("total_goals") > 0, 1).otherwise(0)).alias("with_goals"),
    ).collect()[0]

    # cost-bearing shapes: 8 of 13 templates carry tables (booths, bell,
    # phase1, multifund, impl, adaptive always; sectioned/noise never)
    ok_docs = row["docs"] - row["failures"]
    failures = []
    if row["matched"] != row["parity_rows"]:
        failures.append(f"byte parity: {row['matched']}/{row['parity_rows']}")
    if row["failures"] / row["docs"] > 0.02:
        failures.append(f"failure rate {row['failures']}/{row['docs']} > 2%")
    cost_share = row["with_cost"] / ok_docs
    if cost_share < 0.40:  # 6/13 shapes are cost-bearing by construction
        failures.append(f"cost coverage {cost_share:.2%} < 40%")
    goal_share = row["with_goals"] / ok_docs
    if goal_share < 0.85:  # all shapes except 'plain' carry goals
        failures.append(f"goal coverage {goal_share:.2%} < 85%")

    print({k: row[k] for k in row.asDict()})
    if failures:
        for f in failures:
            print(f"AUDIT FAIL: {f}")
        return 1
    print("AUDIT OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
