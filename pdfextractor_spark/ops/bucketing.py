"""Bucketed (co-located) tables: the pre-shuffle that amortizes across jobs.

At 100 TB the dominant cost of a repeated fact-fact join (e.g. silver
reports joined to a dedup/lineage side-table on url every pipeline run) is
re-shuffling both sides on the key every time. Writing both tables with
``bucketBy(n, key)`` materializes that shuffle ONCE at write time: Spark
records the bucket spec in the catalog and a later equi-join on the bucket
key reads matching buckets pairwise — the join plan contains **no Exchange
on either side** (verified in tests/test_bucketing.py). This is the
parquet-catalog stand-in for Iceberg's bucket partition transform.

Rules that make bucket co-location actually kick in (and that the helper
enforces/documents):
- both sides bucketed on the join key with the SAME bucket count (or an
  exact multiple, Spark 3.1+ with bucket coalescing),
- bucket columns must be the join columns,
- ``spark.sql.sources.bucketing.enabled`` (default true) and a sort-merge
  join (bucketing does not help broadcast joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table"]


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 32, sort_cols: list[str] | None = None) -> None:
    """Save ``df`` as a catalog-managed parquet table bucketed (and
    optionally sorted) on ``bucket_cols``. Sorting within buckets
    additionally removes the per-task Sort from later sort-merge joins."""
    writer = (
        df.write.mode("overwrite").format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
