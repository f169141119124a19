from redskins_rule_spark.plans.explain import (
    assert_no_bnlj,
    formatted_plan,
    has_pushed_filters,
)

__all__ = ["formatted_plan", "has_pushed_filters", "assert_no_bnlj"]
