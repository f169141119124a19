"""Bucketed-join and salted-join tests — semantics AND plan shape."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from redskins_rule_spark.operators.skew import salted_join
from redskins_rule_spark.plans.explain import formatted_plan
from redskins_rule_spark.sources.bucketing import bucketed_join, write_bucketed
from redskins_rule_spark.sources.io import table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_plans_without_exchange(spark, no_broadcast):
    tag = uuid.uuid4().hex[:8]
    lt, rt = f"li_b_{tag}", f"ord_b_{tag}"
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    try:
        write_bucketed(li, lt, ["l_orderkey"], 4, sort_cols=["l_orderkey"])
        write_bucketed(orders, rt, ["l_orderkey"], 4, sort_cols=["l_orderkey"])
        joined = bucketed_join(spark, lt, rt, ["l_orderkey"])
        plan = formatted_plan(joined)
        # co-located: no shuffle on either side of the join
        assert "Exchange" not in plan, plan
        # and the same join WITHOUT bucketing does shuffle
        unbucketed = li.join(orders, "l_orderkey")
        assert "Exchange" in formatted_plan(unbucketed)
        # values identical
        assert joined.count() == unbucketed.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_salted_join_matches_plain_join(spark):
    # skewed large side: 90% of rows share key 1
    large = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(1, "hot"), (950, "cold")], "k bigint, label string"
    )
    for how in ("inner", "left"):
        got = salted_join(large, small, ["k"], how=how, salt=4)
        want = large.join(small, ["k"], how)
        assert got.count() == want.count()
        assert (
            got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
        ), how


def test_salted_join_spreads_hot_key(spark):
    large = spark.range(1000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(1, "x")], "k bigint, label string")
    from redskins_rule_spark.operators.skew import SALT_COL

    salted = large.withColumn(
        SALT_COL, F.pmod(F.xxhash64("k", "v"), F.lit(8))
    )
    n_subkeys = salted.select(SALT_COL).distinct().count()
    assert n_subkeys == 8  # the single hot key now occupies 8 shuffle keys
    out = salted_join(large, small, ["k"], salt=8)
    assert out.count() == 1000


def test_aqe_splits_skewed_join(spark):
    """The session's AQE posture (skewJoin on) actually splits a hot
    key at runtime: final plan shows SortMergeJoin(skew=true) with a
    skewed AQEShuffleRead. Thresholds are lowered to make a ~10MB
    fixture 'skewed'; production defaults scale the same mechanism."""
    keep = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        big = spark.range(400000).select(
            F.when(F.col("id") < 380000, F.lit(1)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("v"),
        )
        small = spark.range(2000).select(F.col("id").alias("k"), F.lit("x").alias("w"))
        joined = big.join(small, "k")
        joined.collect()  # finalize the adaptive plan
        plan = formatted_plan(joined, "simple")
        assert "skew=true" in plan, plan
    finally:
        for k, v in keep.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
