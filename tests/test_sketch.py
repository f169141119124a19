"""KMV distinct sketch: exactness below k, accuracy above k, and
partition-independence of the local top-k combine."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from redskins_rule_spark.operators.sketch import kmv_distinct


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 10) for i in range(100)] + [("b", i % 3) for i in range(30)],
        "g string, v int",
    )
    got = {r.g: r.approx_distinct for r in kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert got == {"a": 10, "b": 3}  # D < k → the sketch IS the distinct set


def test_kmv_estimate_accuracy_above_k(spark):
    n = 5000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").cast("int").alias("v")
    )
    est = kmv_distinct(df, ["g"], "v", k=256).collect()[0].approx_distinct
    assert abs(est - n) / n < 0.15  # ~1/sqrt(k) relative error


def test_kmv_partition_invariant(spark):
    # the local combine must not change the result vs a single partition
    df = spark.range(2000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") % 700).cast("int").alias("v"),
    )
    many = kmv_distinct(df.repartition(16), ["g"], "v", k=32).collect()
    one = kmv_distinct(df.coalesce(1), ["g"], "v", k=32).collect()
    assert {tuple(r) for r in many} == {tuple(r) for r in one}


def test_kmv_rejects_bad_k(spark):
    df = spark.range(1).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="k must be"):
        kmv_distinct(df, ["g"], "v", k=1)
