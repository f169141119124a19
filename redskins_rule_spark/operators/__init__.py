from redskins_rule_spark.operators.analytic import (
    arg_max,
    arg_min,
    forward_fill,
    lag_over,
    topk_per_group,
)
from redskins_rule_spark.operators.asof import asof_join

__all__ = [
    "arg_max",
    "arg_min",
    "forward_fill",
    "lag_over",
    "topk_per_group",
    "asof_join",
]
