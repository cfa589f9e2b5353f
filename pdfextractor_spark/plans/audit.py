"""Physical-plan audit helpers: make 'is the plan right at 100 TB?' a
testable invariant instead of a manual .explain() read.

Checks exposed: predicate pushdown reached the parquet scan, column pruning
(ReadSchema), broadcast vs sort-merge join strategy, number of exchanges
(shuffles), and whole-stage-codegen coverage. Used by tests/test_plans.py to
pin the plan shape of every headline query.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schemas",
    "join_strategies",
    "num_exchanges",
    "codegen_span_count",
    "plan_summary",
]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The string `df.explain(mode)` would print (without printing it)."""
    jqe = df._jdf.queryExecution()
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jqe.explainString(jmode)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans (empty '[]' entries dropped)."""
    text = explain_str(df, "formatted")
    out = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", text):
        inner = m.group(1).strip()
        if inner:
            out.extend(p.strip() for p in inner.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings for each scan (column-pruning evidence)."""
    text = explain_str(df, "formatted")
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", text)]


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in the executed plan (BroadcastHashJoin,
    SortMergeJoin, ShuffledHashJoin, BroadcastNestedLoopJoin)."""
    text = explain_str(df, "simple")
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)", text
    )


def num_exchanges(df: DataFrame) -> int:
    """Shuffle count (Exchange hashpartitioning/rangepartitioning/
    SinglePartition), excluding broadcast exchanges and AQE reuse."""
    text = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", text))


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans in the FINAL (post-AQE) plan.
    Executes the query: under AQE the plan is only finalized — and codegen
    stages materialized — after the job runs."""
    df.collect()  # count() would build a different plan; collect this one
    text = explain_str(df, "formatted")
    return len(set(re.findall(r"\[codegen id : (\d+)\]", text)))


def plan_summary(df: DataFrame) -> dict:
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "joins": join_strategies(df),
        "exchanges": num_exchanges(df),
        "codegen_spans": codegen_span_count(df),
    }
