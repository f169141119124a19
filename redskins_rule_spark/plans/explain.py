"""Physical-plan inspection helpers.

The scale contract ("would this survive 100×?") is checked in tests by
asserting on plan text: filters pushed to the parquet scan, no
accidental BroadcastNestedLoopJoin on the hot path, whole-stage
codegen present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (the `*(n)` prefixes in the
    simple plan). 0 means the hot path fell out of codegen entirely.

    Collects the frame first (call on small/test frames only): under
    AQE the codegen annotation only exists on the FINAL adaptive plan,
    and only an action on THIS frame's query execution finalizes it
    (a .write runs a separate query execution).
    """
    import re

    df.collect()
    plan = formatted_plan(df, "simple")
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


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
