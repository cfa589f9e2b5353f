"""Rolling-hash document fingerprinting (winnowing) for partial-overlap
detection — the chunk-level complement to whole-document dedup: two documents
sharing a long passage (quote, boilerplate, mirrored section) collide on the
winnowed fingerprints of that passage even when the rest differs.

Scheme (standard winnowing, Schleimer et al. 2003): polynomial rolling hash
over char k-grams, then the minimum hash of each sliding window of ``w``
k-gram hashes is selected (rightmost-min tie-break via reversed argmin),
deduplicated. Guarantees any shared substring of length >= k + w - 1
produces at least one shared fingerprint.

All per-document math is vectorized numpy (sliding windows over a byte
array); corpus-level matching is a native explode -> groupBy -> pair join,
keyed on uniform hashes (no skew salting needed).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

__all__ = ["winnow_fingerprints", "fingerprint_overlap_pairs"]

_BASE = 1_000_003  # odd multiplier; uint64 wraparound multiply


def winnow_fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 7, window: int = 4) -> DataFrame:
    """(id, fingerprints array<long>, n_grams long) per document."""
    import numpy as np

    powers = np.power(np.uint64(_BASE), np.arange(k - 1, -1, -1, dtype=np.uint64))

    @pandas_udf(ArrayType(LongType()))
    def _fp(texts: pd.Series) -> pd.Series:
        from numpy.lib.stride_tricks import sliding_window_view

        out = []
        for t in texts:
            if not isinstance(t, str) or len(t) < k:
                out.append([])
                continue
            b = np.frombuffer(t.lower().encode("utf-8", errors="replace"), dtype=np.uint8)
            if len(b) < k:
                out.append([])
                continue
            grams = sliding_window_view(b, k).astype(np.uint64)
            hashes = (grams * powers[None, :]).sum(axis=1)  # wraps mod 2^64
            if len(hashes) < window:
                sel = np.array([hashes.min()], dtype=np.uint64)
            else:
                wins = sliding_window_view(hashes, window)
                sel = wins.min(axis=1)
            # shift BEFORE unique: two values differing only in the low bit
            # would otherwise collide into in-array duplicates after >>1
            fps = np.unique(sel >> np.uint64(1))  # fit positive signed long
            out.append(fps.astype(np.int64).tolist())
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("id"),
        _fp(F.col(text_col)).alias("fingerprints"),
    ).withColumn("n_fps", F.size("fingerprints").cast("long"))


def fingerprint_overlap_pairs(fps: DataFrame, min_overlap: float = 0.5) -> DataFrame:
    """Pairs sharing winnowed fingerprints: overlap = |shared| / min(|a|,|b|).

    explode -> self-join on fingerprint -> count shared per pair; candidate
    volume is bounded by fingerprint bucket sizes (uniform 63-bit hashes)."""
    e = fps.select("id", "n_fps", F.explode("fingerprints").alias("fp"))
    l, r = e.alias("l"), e.alias("r")
    shared = (
        l.join(r, (F.col("l.fp") == F.col("r.fp")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                 F.col("l.n_fps").alias("n_a"), F.col("r.n_fps").alias("n_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    overlap = F.col("shared") / F.least("n_a", "n_b")
    return (
        shared.withColumn("overlap", F.round(overlap, 6))
        .where(F.col("overlap") >= min_overlap)
        .select("id_a", "id_b", "shared", "overlap")
    )
