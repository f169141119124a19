from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redskins_rule_spark.operators.analytic import (
    arg_max,
    arg_min,
    forward_fill,
    lag_over,
    topk_per_group,
)


def test_arg_max_deterministic_ties(spark):
    # two rows tie on score; tiebreak on name must pick 'b' (max)
    df = spark.createDataFrame(
        [("g1", "a", 10), ("g1", "b", 10), ("g1", "c", 5), ("g2", "z", 1)],
        "grp string, name string, score int",
    )
    out = arg_max(
        df, ["grp"], {"winner": "name", "win_score": "score"},
        order_by="score", tiebreak=["name"],
    ).collect()
    got = {r.grp: (r.winner, r.win_score) for r in out}
    assert got == {"g1": ("b", 10), "g2": ("z", 1)}


def test_arg_min(spark):
    df = spark.createDataFrame(
        [("g1", "a", 10), ("g1", "b", 3)], "grp string, name string, score int"
    )
    out = arg_min(df, ["grp"], {"loser": "name"}, order_by="score").collect()
    assert out[0].loser == "b"


def test_topk_per_group_rank_keeps_ties(spark):
    df = spark.createDataFrame(
        [("g", "a", 10), ("g", "b", 10), ("g", "c", 5)],
        "grp string, name string, score int",
    )
    ranked = topk_per_group(
        df, ["grp"], [F.col("score").desc()], k=1, method="rank", rank_col="rnk"
    ).collect()
    assert sorted(r.name for r in ranked) == ["a", "b"]  # RANK keeps ties
    rn = topk_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("name")], k=1, method="row_number"
    ).collect()
    assert [r.name for r in rn] == ["a"]


def test_lag_over(spark):
    df = spark.createDataFrame(
        [("u", 1, 10.0), ("u", 2, 20.0), ("u", 3, 30.0)], "k string, t int, v double"
    )
    out = lag_over(df, "v", order_by=["t"], partition_by=["k"], out="prev")
    got = {r.t: r.prev for r in out.collect()}
    assert got == {1: None, 2: 10.0, 3: 20.0}


def test_global_window_guard(spark):
    df = spark.createDataFrame([(1, 1.0)], "t int, v double")
    with pytest.raises(ValueError, match="single-task bottleneck"):
        lag_over(df, "v", order_by=["t"])
    # explicit opt-in works
    assert lag_over(df, "v", order_by=["t"], allow_global=True).count() == 1


def test_forward_fill(spark):
    df = spark.createDataFrame(
        [("u", 1, None), ("u", 2, 5.0), ("u", 3, None), ("u", 4, 7.0), ("v", 1, None)],
        "k string, t int, v double",
    )
    out = forward_fill(df, "v", order_by=["t"], partition_by=["k"], out="ff")
    got = {(r.k, r.t): r.ff for r in out.collect()}
    assert got == {("u", 1): None, ("u", 2): 5.0, ("u", 3): 5.0, ("u", 4): 7.0, ("v", 1): None}
