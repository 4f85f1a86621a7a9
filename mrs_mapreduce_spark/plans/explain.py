"""Helpers for asserting on and reporting Spark physical plans."""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, finalize: bool = False) -> str:
    """The physical plan string; ``finalize`` executes first so AQE's
    final plan (with codegen span markers ``*(n)``) is visible."""
    if finalize:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` as a string (node list + details)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_flags(df: DataFrame) -> dict[str, bool]:
    """Quick predicates about a plan, used by tests and PLANS.md."""
    plan = executed_plan(df)
    return {
        "pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "partial_agg": "partial_" in plan,
        "broadcast_join": "BroadcastHashJoin" in plan,
        "sort_merge_join": "SortMergeJoin" in plan,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "window_group_limit": "WindowGroupLimit" in plan,
        "has_exchange": "Exchange" in plan,
        "cartesian": "CartesianProduct" in plan,
        "python_eval": "BatchEvalPython" in plan or "ArrowEvalPython" in plan,
    }
