"""Physical-plan inspection helpers.

The reference has no optimizer (SURVEY.md §4); the engine's performance
contract is that Catalyst produces the *right* plans — filters reach
the parquet scan, small sides broadcast, aggregations partial-combine,
and narrow operators stay exchange-free. These helpers make those
properties assertable in tests (tests/test_plans.py) so a plan
regression fails CI instead of silently costing 10× at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # After an action, AQE's toString shows "== Final Plan ==" AND
    # "== Initial Plan ==" — keep only the final section so operator
    # counts aren't doubled.
    marker = "== Initial Plan =="
    if marker in plan:
        plan = plan.split(marker)[0]
    return plan


def formatted_plan(df: DataFrame) -> str:
    """The `explain("formatted")` text."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = executed_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan))


def broadcast_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("SortMergeJoin")


def pushed_filters(df: DataFrame) -> list[str]:
    """DataFilters/PushedFilters entries on every parquet scan."""
    plan = executed_plan(df)
    out = []
    for m in re.finditer(r"(?:Pushed|Data)Filters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    plan = executed_plan(df)
    out = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\]", plan):
        cols = [c.split("#")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def broadcast_nlj_count(df: DataFrame) -> int:
    """BroadcastNestedLoopJoin occurrences — the physical form Spark
    picks for 1-row broadcast cross joins (scalar/grid folding); cheap
    when the broadcast side is model-sized, so plan tests count it
    separately from hash joins."""
    return executed_plan(df).count("BroadcastNestedLoopJoin")
