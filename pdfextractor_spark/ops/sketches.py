"""Sketch aggregates: the one-pass, mergeable summaries that replace exact
distinct/percentile computations at 100 TB.

``approx_count_distinct`` (HyperLogLog++) and ``percentile_approx``
(KLL-style quantile summary) are both algebraic aggregates: partial sketches
merge associatively, so the plan is a map-side partial + one shuffle of
KB-sized sketch state instead of shuffling every distinct value (exact
count-distinct expands rows; exact percentiles sort whole partitions).
Error bounds are pinned against exact answers in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cardinality_rollup", "quantile_rollup"]


def cardinality_rollup(df: DataFrame, value_col: str, group_col: str,
                       rsd: float = 0.02) -> DataFrame:
    """Per-group exact vs HLL distinct counts + relative error.

    ``rsd`` is the HLL target relative standard deviation (2% default ->
    ~1.5 KB of sketch state per group regardless of cardinality).

    The exact side runs as distinct-pairs -> count (two cheap shuffles with
    map-side partial dedup) and joins the one-pass HLL rollup, instead of
    mixing countDistinct + approx in one agg — that mixed form plans an
    Expand that duplicates every input row through both aggregate phases
    (measured 3x slower at sf0.1, and the 2x row inflation is exactly what
    you can't afford at 100 TB)."""
    exact = (
        df.select(group_col, value_col)
        .distinct()
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    approx = df.groupBy(group_col).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct")
    )
    return (
        exact.join(approx, group_col)
        .withColumn(
            "rel_error",
            F.round(
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                / F.greatest(F.col("exact_distinct"), F.lit(1)),
                6,
            ),
        )
        .orderBy(group_col)
    )


def quantile_rollup(df: DataFrame, value_col: str, group_col: str,
                    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
                    accuracy: int = 10000) -> DataFrame:
    """Per-group approximate quantiles (one pass, mergeable summaries).

    ``accuracy`` trades memory for error: rank error <= 1/accuracy."""
    qarr = F.array(*[F.lit(q) for q in quantiles])
    out = df.groupBy(group_col).agg(
        F.percentile_approx(value_col, qarr, F.lit(accuracy)).alias("qs"),
        F.count(F.lit(1)).alias("n"),
    )
    cols = [F.col("qs")[i].alias(f"p{int(q * 100)}") for i, q in enumerate(quantiles)]
    return out.select(group_col, "n", *cols).orderBy(group_col)
