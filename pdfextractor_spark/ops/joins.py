"""Temporal / non-equi join operators Spark lacks as built-ins.

``asof_join`` is the classic scalable formulation (union the two inputs on
the key, sort by time within the key, carry the last-seen right payload
forward with ``last(..., ignorenulls=True)``): ONE shuffle on the key and a
per-partition sort — never the per-key candidate explosion of the naive
``left.ts >= right.ts`` inequality join, whose cost is O(|L_k| * |R_k|) per
key. This is the temporal-join shape streaming engines (Flink temporal
tables, kdb aj) use, re-expressed on the Spark DataFrame API.

``range_join_broadcast`` covers the small-dimension banding join (value
BETWEEN lo AND hi): broadcasting the band table keeps Catalyst on
BroadcastNestedLoopJoin instead of a full cartesian shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_broadcast"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_order: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` on the same key.

    Ties on ``right_ts`` resolve by ``right_order`` (default: payload_cols)
    ascending — the LAST row in that order wins, i.e. the max. Output: all
    left columns + ``asof_<payload>`` columns. ``how='left'`` keeps left
    rows with no prior right row (null payloads); ``'inner'`` drops them.
    """
    from pyspark.sql.types import StructField, StructType

    right_order = right_order or payload_cols
    lcols = left.columns
    # ONE struct holds every payload field: a right row whose individual
    # payload fields are NULL still produces a non-null struct, so (a) all
    # asof_* fields always come from the SAME right row (no cross-row
    # splicing from per-column last()), and (b) inner-match detection does
    # not depend on any payload field being non-null.
    payload_struct_t = StructType(
        [StructField(c, right.schema[c].dataType) for c in payload_cols]
    )

    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(payload_struct_t).alias("_asof_payload"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_asof_ord_{i}")
          for i, c in enumerate(right_order)],
    )
    r_tagged = right.select(
        *[
            (F.col(right_key).alias(c) if c == left_key else F.lit(None).cast(left.schema[c].dataType).alias(c))
            for c in lcols
        ],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_asof_payload"),
        *[F.col(c).alias(f"_asof_ord_{i}") for i, c in enumerate(right_order)],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows (side=0) sort before left rows at equal ts => an order dated
    # exactly at the event timestamp is visible to that event
    w = (
        Window.partitionBy(left_key)
        .orderBy("_asof_ts", "_asof_side", *[f"_asof_ord_{i}" for i in range(len(right_order))])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        F.col("_asof_side").alias("_side"),
        F.last("_asof_payload", ignorenulls=True).over(w).alias("_asof_p"),
    )
    out = filled.where(F.col("_side") == 1).drop("_side")
    if how == "inner":
        out = out.where(F.col("_asof_p").isNotNull())
    out = out.select(
        *lcols,
        *[F.col(f"_asof_p.{c}").alias(f"asof_{c}") for c in payload_cols],
    )
    return out


def range_join_broadcast(fact: DataFrame, bands: DataFrame, value_col: str,
                         lo_col: str = "lo", hi_col: str = "hi") -> DataFrame:
    """Band/range join: fact rows matched to the (small) band table where
    ``lo <= value <= hi``. Explicit broadcast => BroadcastNestedLoopJoin,
    never a shuffled cartesian product."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col))
    return fact.join(F.broadcast(bands), cond)
