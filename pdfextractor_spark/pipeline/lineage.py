"""Per-partition lineage + checkpoint/resume primitives.

The reference persists ``*.state.json`` with processed/remaining lists after
every chunk (backend/scripts/chunked_mdeq_extraction.js:107-166); here each
checkpointed stage write carries a ``_lineage`` table (stage, partition id,
doc count, bytes, failure counters), and resume is the anti-join of the input
against already-done urls (operator J7) — broadcast when the done-list is
small, sort-merge otherwise (AQE decides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stage_lineage", "resume_remaining", "write_stage"]


def stage_lineage(df: DataFrame, stage: str, error_col: str = "error",
                  bytes_col: str = "raw_text") -> DataFrame:
    """Per-partition rollup: (stage, partition_id, doc_count, bytes, failures)."""
    base = df.withColumn("partition_id", F.spark_partition_id())
    byts = (F.sum(F.length(F.col(bytes_col))) if bytes_col in df.columns else F.lit(0)).alias("bytes")
    fails = (F.sum(F.when(F.col(error_col).isNotNull(), 1).otherwise(0))
             if error_col in df.columns else F.lit(0)).alias("failures")
    return (
        base.groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            byts,
            fails,
        )
        .select(F.lit(stage).alias("stage"), "partition_id", "doc_count",
                F.coalesce(F.col("bytes"), F.lit(0)).alias("bytes"), "failures")
    )


def resume_remaining(input_df: DataFrame, done_df: DataFrame, key: str = "url",
                     broadcast_threshold: int | None = 1_000_000) -> DataFrame:
    """J7: input rows not yet present in the completed stage output.

    The done-side is pruned to the join key before the anti-join so only the
    key column is shuffled/broadcast; AQE picks broadcast vs sort-merge at
    runtime from actual size."""
    done_keys = done_df.select(key).distinct()
    return input_df.join(done_keys, on=key, how="left_anti")


def write_stage(df: DataFrame, path: str, stage: str, mode: str = "overwrite",
                error_col: str = "error", bytes_col: str = "raw_text") -> None:
    """Checkpointed stage write: data table/parquet + sibling _lineage table.

    Storage is format-dispatched (``pipeline.tableio``): an Iceberg snapshot
    commit per stage when a catalog is configured, parquet directories in
    this sandbox. The lineage side-table rides the same format."""
    from .tableio import read_checkpoint, write_checkpoint

    spark = df.sparkSession
    ref = write_checkpoint(df, path, mode=mode)
    written = read_checkpoint(spark, ref)
    # lineage always rides the checkpoint; a stage with no error column
    # records failures=0 (stage_lineage tolerates its absence)
    write_checkpoint(
        stage_lineage(written, stage, error_col=error_col, bytes_col=bytes_col),
        path.rstrip("/") + "_lineage",
        mode="overwrite",
    )
