"""Gold export writers (S7): CSV + JSON per report.

Mirrors the reference's export route (ref: backend/routes/export.js:27-38):
JSON is the silver record itself; CSV is the demo flattening of goals+bmps
(ref: backend/utils/toCSV.js:1-12 — header ``Section,ID,Field1,Field2,
Field3``, commas in names replaced by spaces, constant trailing field).

Spark-first shape: the per-report export STRINGS are computed as native
columns (no Python in the hot path) so they can be written as a columnar
gold table; ``export_gold_files`` additionally materializes one
``<id>.csv``/``<id>.json`` per report via ``foreachPartition`` (distributed
writers — no driver-side collect), for parity with the reference's
file-per-report gold directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["report_to_csv", "gold_export_strings", "export_gold_files"]


def report_to_csv(report: dict) -> str:
    """Python twin of the reference's convertToCSV (used by tests and the
    per-file writer for already-collected dict reports)."""
    rows = ["Section,ID,Field1,Field2,Field3"]
    for g in report.get("goals") or []:
        rows.append(",".join(["Goal", str(g.get("id") or ""),
                              str(g.get("title") or "").replace(",", " "),
                              str(g.get("status") or ""), ""]))
    for b in report.get("bmps") or []:
        rows.append(",".join(["BMP", str(b.get("id") or ""),
                              str(b.get("name") or "").replace(",", " "),
                              str(b.get("category") or ""), ""]))
    return "\n".join(rows)


def gold_export_strings(silver: DataFrame) -> DataFrame:
    """(url, csv, json) with both export payloads as native columns.

    ``json`` reuses the silver stage's ``report_json`` (the full structured
    report); ``csv`` is assembled with transform/array_join — whole-stage
    codegen end to end."""
    goal_rows = F.transform(
        "goals",
        lambda g: F.concat_ws(",", F.lit("Goal"), F.coalesce(g["id"], F.lit("")),
                              F.replace(F.coalesce(g["title"], F.lit("")), F.lit(","), F.lit(" ")),
                              F.coalesce(g["status"], F.lit("")), F.lit("")),
    )
    bmp_rows = F.transform(
        "bmps",
        lambda b: F.concat_ws(",", F.lit("BMP"), F.coalesce(b["id"], F.lit("")),
                              F.replace(F.coalesce(b["name"], F.lit("")), F.lit(","), F.lit(" ")),
                              F.coalesce(b["category"], F.lit("")), F.lit("")),
    )
    all_rows = F.concat(
        F.array(F.lit("Section,ID,Field1,Field2,Field3")), goal_rows, bmp_rows
    )
    return silver.select(
        "url",
        F.array_join(all_rows, "\n").alias("csv"),
        F.col("report_json").alias("json"),
    )


def _slug_of_url(url: str) -> str:
    import re

    s = url.rsplit("/", 1)[-1].lower()
    s = re.sub(r"[^a-z0-9-]+", "-", s)
    return re.sub(r"-+", "-", s).strip("-") or "report"


def export_gold_files(silver: DataFrame, out_dir: str,
                      formats: tuple[str, ...] = ("json", "csv")) -> int:
    """Write one ``<slug>.<fmt>`` per report under ``out_dir`` from the
    executors (each partition writes its own documents). Returns the number
    of reports exported."""
    os.makedirs(out_dir, exist_ok=True)
    exports = gold_export_strings(silver)
    counter = silver.sparkSession.sparkContext.accumulator(0)

    def write_partition(rows):
        for row in rows:
            slug = _slug_of_url(row["url"])
            if "csv" in formats:
                with open(os.path.join(out_dir, f"{slug}.csv"), "w") as f:
                    f.write(row["csv"] or "")
            if "json" in formats:
                with open(os.path.join(out_dir, f"{slug}.json"), "w") as f:
                    f.write(row["json"] or "{}")
            counter.add(1)

    exports.foreachPartition(write_partition)
    return counter.value
