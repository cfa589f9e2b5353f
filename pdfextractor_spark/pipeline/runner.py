"""End-to-end medallion run with checkpoint/resume.

pages -> bronze (text extraction) -> silver (structuring) -> gold aggregates,
each stage written as parquet + lineage; an interrupted run resumes from the
last complete stage via the J7 anti-join.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

from .bronze import extract_bronze
from .gold import gold_cost_summary, gold_coverage, gold_lang_rollup, gold_pattern_usage
from .lineage import resume_remaining, write_stage
from .silver import extract_silver

__all__ = ["run_pipeline"]


def _exists(spark: SparkSession, path: str) -> bool:
    # local-fs check is fine in this sandbox; on a cluster use the Hadoop FS API
    return os.path.exists(path) and (os.path.exists(os.path.join(path, "_SUCCESS")) or any(
        f.endswith(".parquet") for f in os.listdir(path)
    ))


def run_pipeline(spark: SparkSession, pages_df: DataFrame, out_dir: str,
                 mode: str = "exact", bmp_filter: bool = False,
                 resume: bool = True) -> dict:
    """Run pages->bronze->silver->gold. Returns timing + counts summary."""
    os.makedirs(out_dir, exist_ok=True)
    bronze_path = os.path.join(out_dir, "bronze")
    silver_path = os.path.join(out_dir, "silver")
    t0 = time.time()
    timings: dict[str, float] = {}

    if resume and _exists(spark, bronze_path):
        done = spark.read.parquet(bronze_path)
        todo = resume_remaining(pages_df, done, key="url")
        n_todo = todo.count()
        if n_todo > 0:
            extract_bronze(todo).write.mode("append").parquet(bronze_path)
    else:
        write_stage(extract_bronze(pages_df), bronze_path, "bronze")
    bronze = spark.read.parquet(bronze_path)
    timings["bronze_sec"] = time.time() - t0

    t1 = time.time()
    if resume and _exists(spark, silver_path):
        done = spark.read.parquet(silver_path)
        todo = resume_remaining(bronze, done, key="url")
        if todo.limit(1).count() > 0:
            extract_silver(todo, mode=mode, bmp_filter=bmp_filter).write.mode("append").parquet(silver_path)
    else:
        write_stage(extract_silver(bronze, mode=mode, bmp_filter=bmp_filter), silver_path,
                    "silver", bytes_col="report_json")
    silver = spark.read.parquet(silver_path)
    timings["silver_sec"] = time.time() - t1

    t2 = time.time()
    gold = {
        "lang_rollup": gold_lang_rollup(silver),
        "pattern_usage": gold_pattern_usage(silver),
        "cost_summary": gold_cost_summary(silver),
        "coverage": gold_coverage(silver),
    }
    for name, df in gold.items():
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"gold_{name}"))
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
