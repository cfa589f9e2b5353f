"""Runtime Arrow batch-size derivation for payload-heavy UDF stages.

``spark.sql.execution.arrow.maxRecordsPerBatch`` is a static row COUNT, but
the OOM hazard is batch BYTES: 1024 rows of ~kB documents is ~1 MB, while
1024 rows of 10 MB documents is ~10 GB per in-flight batch on both sides of
the Arrow channel. Before a ``mapInPandas`` stage over a payload column, we
probe the average payload size on a bounded sample (``limit(N)`` — one input
split, no full scan) and set the conf so a batch targets ~64 MB, clamped to
[16, 1024] rows. An explicit ``SPARK_GRAFT_ARROW_BATCH`` always wins, and
corpora of ordinary web-page size resolve to the 1024-row ceiling, so the
default behavior is unchanged except where it would have OOMed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["autosize_arrow_batch"]

TARGET_BATCH_BYTES = 64 << 20
_LO, _HI = 16, 1024
_PROBE_ROWS = 256


# (session id, plan semantic hash, payload cols) -> chosen rows/batch.
# The probe is a tuning decision about a TABLE, not about one query run:
# re-running the same extraction over the same source must not pay a probe
# job per call (it shows up as fixed per-job overhead in throughput runs).
_PROBE_CACHE: dict[tuple, int] = {}


def _cache_key(df: DataFrame, payload_cols: list[str]):
    try:
        sem = df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        return None
    spark = df.sparkSession
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:
        app_id = id(spark)
    return (app_id, sem, tuple(payload_cols))


def autosize_arrow_batch(df: DataFrame, payload_cols: list[str]) -> int:
    """Set ``arrow.maxRecordsPerBatch`` for this session from the average
    payload bytes of ``df`` over ``payload_cols``; returns the chosen rows
    per batch. No-op (returns the env value) when SPARK_GRAFT_ARROW_BATCH
    is set explicitly. Memoized per (session, source plan): repeated stages
    over the same table reuse the first probe instead of running a new job."""
    spark = df.sparkSession
    env = os.environ.get("SPARK_GRAFT_ARROW_BATCH")
    if env:
        return int(env)
    key = _cache_key(df, payload_cols)
    if key is not None and key in _PROBE_CACHE:
        rows = _PROBE_CACHE[key]
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(rows))
        return rows
    probe = (
        df.select(
            sum(
                (F.coalesce(F.length(F.col(c)), F.lit(0)) for c in payload_cols),
                F.lit(0),
            ).alias("sz")
        )
        .limit(_PROBE_ROWS)
        .agg(F.avg("sz").alias("avg_sz"))
        .collect()[0]
    )
    avg = probe["avg_sz"] or 0.0
    rows = _HI if avg <= 0 else max(_LO, min(_HI, int(TARGET_BATCH_BYTES / max(avg, 1.0))))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(rows))
    if key is not None:
        _PROBE_CACHE[key] = rows
    return rows
