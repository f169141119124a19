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


def test_salted_join_exchange_plan(spark):
    """VERDICT r7 item 5: q201 drives salted_join through the driver
    hash; this pins the PLAN half — with broadcast off, both sides
    shuffle on (join keys + __salt), i.e. the salt actually reaches
    the exchange partitioning, and the salted result still equals the
    plain join."""
    from redskins_rule_spark.operators.skew import SALT_COL
    from redskins_rule_spark.plans.explain import formatted_plan

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        large = spark.range(500).select(
            (F.col("id") % 7).alias("k"), F.col("id").alias("v")
        )
        small = spark.range(7).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        out = salted_join(large, small, ["k"], salt=8)
        plan = formatted_plan(out)
        salted_exchanges = [
            ln
            for ln in plan.splitlines()
            if "hashpartitioning" in ln and SALT_COL in ln
        ]
        assert len(salted_exchanges) >= 2, plan  # both join inputs
        want = sorted(
            (r.k, r.v, r.w) for r in large.join(small, ["k"]).collect()
        )
        assert sorted((r.k, r.v, r.w) for r in out.collect()) == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


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


def test_bloom_semi_join_equals_exact_semi_join(spark):
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.skew import bloom_semi_join

    big = spark.createDataFrame(
        [(i, f"v{i}") for i in range(2000)], "k int, payload string"
    )
    small = spark.createDataFrame(
        [(i * 37,) for i in range(20)], "sk int"
    )
    got = bloom_semi_join(big, small, "k", "sk", m_bits=1 << 12, k=3)
    exact = big.join(
        small.select(F.col("sk").alias("k")).distinct(), on="k", how="semi"
    )
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in exact.collect()
    )
    assert got.columns == big.columns


def test_bloom_prune_superset_and_effective(spark):
    from redskins_rule_spark.operators.skew import (
        bloom_build,
        bloom_semi_join,
    )

    big = spark.createDataFrame([(i,) for i in range(5000)], "k int")
    small = spark.createDataFrame([(i,) for i in range(50)], "sk int")
    pruned = bloom_semi_join(
        big, small, "k", "sk", m_bits=1 << 13, k=3, verify=False
    )
    kept = {r.k for r in pruned.collect()}
    assert set(range(50)) <= kept          # no false negatives
    assert len(kept) < 5000 * 0.05         # filter actually prunes
    state = bloom_build(small, "sk", m_bits=1 << 13, k=3).collect()[0]
    assert len(state["__bloom"]) <= (1 << 13) // 64  # bitmap is bounded

    import pytest as _pytest

    with _pytest.raises(ValueError):
        bloom_build(small, "sk", m_bits=100)
