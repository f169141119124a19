"""Physical-plan inspection helpers.

The scale contract ("would this survive 100×?") is checked in tests by
asserting on plan text: filters pushed to the parquet scan, no
accidental BroadcastNestedLoopJoin on the hot path, whole-stage
codegen present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, fragment: str) -> bool:
    """True if the formatted plan shows `fragment` inside PushedFilters."""
    plan = formatted_plan(df)
    return any(
        "PushedFilters" in line and fragment in line for line in plan.splitlines()
    )


def assert_no_bnlj(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "BroadcastNestedLoopJoin" in plan:
        raise AssertionError(
            "plan contains BroadcastNestedLoopJoin — quadratic at scale:\n" + plan
        )
