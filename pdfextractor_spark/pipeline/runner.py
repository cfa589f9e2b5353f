"""End-to-end medallion run with checkpoint/resume.

pages -> bronze (text extraction) -> silver (structuring) -> gold aggregates,
each stage committed as an Iceberg snapshot when a catalog is configured
(parquet + lineage side-table in this sandbox — see pipeline.tableio); an
interrupted run resumes from the last complete stage via the J7 anti-join.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

from .bronze import extract_bronze
from .gold import (
    bronze_content_audit_summary, gold_cost_summary, gold_coverage,
    gold_lang_rollup, gold_pattern_usage, reextract_candidates,
    silver_anomaly_summary,
)
from .lineage import resume_remaining, write_stage
from .silver import extract_silver
from .tableio import (
    checkpoint_format,
    iceberg_catalog,
    read_checkpoint,
    table_identifier,
    write_checkpoint,
)

__all__ = ["run_pipeline"]


def _stage_ref(spark: SparkSession, path: str) -> tuple[str, str]:
    """Resolve where a stage checkpoint lives under the active format."""
    if checkpoint_format() == "iceberg":
        cat = iceberg_catalog(spark)
        if cat is not None:
            return ("table", table_identifier(cat, path))
    return ("path", path)


def _exists(spark: SparkSession, ref: tuple[str, str]) -> bool:
    kind, target = ref
    if kind == "table":
        return spark.catalog.tableExists(target)
    # local-fs check is fine in this sandbox; on a cluster use the Hadoop FS API
    return os.path.exists(target) and (os.path.exists(os.path.join(target, "_SUCCESS")) or any(
        f.endswith(".parquet") for f in os.listdir(target)
    ))


def run_pipeline(spark: SparkSession, pages_df: DataFrame, out_dir: str,
                 mode: str = "exact", bmp_filter: bool = False,
                 resume: bool = True) -> dict:
    """Run pages->bronze->silver->gold. Returns timing + counts summary."""
    os.makedirs(out_dir, exist_ok=True)
    bronze_path = os.path.join(out_dir, "bronze")
    silver_path = os.path.join(out_dir, "silver")
    bronze_ref = _stage_ref(spark, bronze_path)
    silver_ref = _stage_ref(spark, silver_path)
    t0 = time.time()
    timings: dict[str, float] = {}

    if resume and _exists(spark, bronze_ref):
        done = read_checkpoint(spark, bronze_ref)
        todo = resume_remaining(pages_df, done, key="url")
        n_todo = todo.count()
        if n_todo > 0:
            write_checkpoint(extract_bronze(todo), bronze_path, mode="append")
    else:
        write_stage(extract_bronze(pages_df), bronze_path, "bronze")
    bronze = read_checkpoint(spark, bronze_ref)
    timings["bronze_sec"] = time.time() - t0

    t1 = time.time()
    if resume and _exists(spark, silver_ref):
        done = read_checkpoint(spark, silver_ref)
        todo = resume_remaining(bronze, done, key="url")
        if todo.limit(1).count() > 0:
            write_checkpoint(
                extract_silver(todo, mode=mode, bmp_filter=bmp_filter),
                silver_path, mode="append",
            )
    else:
        write_stage(extract_silver(bronze, mode=mode, bmp_filter=bmp_filter), silver_path,
                    "silver", bytes_col="report_json")
    silver = read_checkpoint(spark, silver_ref)
    timings["silver_sec"] = time.time() - t1

    t2 = time.time()
    gold = {
        "lang_rollup": gold_lang_rollup(silver),
        "pattern_usage": gold_pattern_usage(silver),
        "cost_summary": gold_cost_summary(silver),
        "coverage": gold_coverage(silver),
        # data-quality diagnostics (SURVEY §2.10b): the re-do list for the
        # next resume pass and the corpus anomaly/quality rollups
        "reextract_candidates": reextract_candidates(bronze),
        "content_audit": bronze_content_audit_summary(bronze),
        "anomaly_summary": silver_anomaly_summary(silver),
    }
    for name, df in gold.items():
        write_checkpoint(df, os.path.join(out_dir, f"gold_{name}"), mode="overwrite")
    timings["gold_sec"] = time.time() - t2

    n_docs = bronze.count()
    n_errors = bronze.where("error is not null").count()
    match = bronze.selectExpr(
        "sum(case when text_match then 1 else 0 end) as m",
        "sum(case when text_match is not null then 1 else 0 end) as t",
    ).first()
    timings["total_sec"] = time.time() - t0
    return {
        "docs": n_docs,
        "errors": n_errors,
        "byte_identical_matched": int(match["m"] or 0),
        "byte_identical_total": int(match["t"] or 0),
        **{k: round(v, 3) for k, v in timings.items()},
    }
