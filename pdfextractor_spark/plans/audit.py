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


def _top_level_bracket_groups(s: str) -> list[str]:
    """Split ``[a], [b [c]], [d]`` into top-level bracket groups."""
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start >= 0:
                groups.append(s[start + 1 : i])
                start = -1
    return groups


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Window operators with NO partitioning whose input is unbounded.

    A ``Window`` node prints 2 top-level bracket groups (functions, order)
    when partition-less and 3 (functions, partition, order) when
    partitioned. A partition-less window funnels its entire input to a
    single task — the classic scale-killer — UNLESS its subtree contains a
    limit (TakeOrderedAndProject / GlobalLimit / CollectLimit), which bounds
    the single partition to k rows. Returns the offending plan lines (empty
    list = plan is scale-safe)."""
    lines = explain_str(df, "simple").splitlines()

    def indent_of(line: str) -> int:
        # operator depth = column of the first letter (tree prefixes are
        # made of spaces, ':', '+', '-' only)
        m = re.search(r"[A-Za-z]", line)
        return m.start() if m else len(line)

    bad = []
    for i, line in enumerate(lines):
        m = re.search(r"\bWindow\b\s*(\[.*)$", line)
        if not m:
            continue
        groups = _top_level_bracket_groups(m.group(1))
        # 3 groups = (funcs, partition, order): partitioned, fine.
        # 2 groups = (funcs, partition) for an unordered window — fine — or
        # (funcs, order) for a partition-less one; order specs always print
        # sort directions, partition specs never do.
        if len(groups) != 2 or not re.search(r"\b(?:ASC|DESC) NULLS\b", groups[1]):
            continue
        ind = indent_of(line)
        bounded = False
        for sub in lines[i + 1 :]:
            if sub.strip() and indent_of(sub) <= ind:
                break
            if re.search(r"TakeOrderedAndProject|GlobalLimit|CollectLimit", sub):
                bounded = True
                break
        if not bounded:
            bad.append(line.strip())
    return bad


def plan_summary(df: DataFrame) -> dict:
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "joins": join_strategies(df),
        "exchanges": num_exchanges(df),
        "codegen_spans": codegen_span_count(df),
    }
