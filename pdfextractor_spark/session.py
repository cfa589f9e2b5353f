"""SparkSession factory tuned for the extraction workload.

Key choices (SURVEY §4):
- Arrow enabled with ``maxRecordsPerBatch`` defaulting to 1024 (override via
  ``SPARK_GRAFT_ARROW_BATCH``): large enough to amortize Arrow transfer +
  UDF dispatch overhead on the ~kB synthetic documents (raised from the
  initial 256 after measurement), small enough that a batch of multi-MB
  documents still fits executor memory — drop the env var for corpora with
  much bigger text cells.
- AQE on: coalesces post-shuffle partitions and splits skewed ones at runtime.
- ``spark.sql.shuffle.partitions`` sized to cores (local mode); on a real
  cluster this scales with executor count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pdfextractor-spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores:
        master = f"local[{cores}]"
    else:
        master = os.environ.get("SPARK_MASTER", "local[*]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalesces post-shuffle partitions by BYTES; extracted text
        # shuffles ~5x lz4-compressed, and the per-doc work downstream of a
        # dedup/window exchange (PII regexes, flag chains) is CPU-dense per
        # byte. With parallelismFirst the coalesce target is
        # max(total/parallelism, minPartitionSize); the 1 MiB default folds
        # a ~1 MB shuffle (thousands of documents) into ONE task. 64k keeps
        # small-corpus runs parallel and is a no-op at scale, where
        # total/parallelism dominates.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "1024"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or (cores or 32)))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
