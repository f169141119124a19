"""Global index operator (operators/indexing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redskins_rule_spark.operators.indexing import with_global_index
from redskins_rule_spark.sources.io import table

SF_DIR = "/root/testdata/sf0.001"


def test_matches_row_number_semantics(spark):
    cust = table(spark, SF_DIR, "customer")
    out = with_global_index(cust, ["c_custkey"], num_partitions=7)
    got = [r["c_custkey"] for r in out.orderBy("idx").collect()]
    want = [r["c_custkey"] for r in cust.orderBy("c_custkey").collect()]
    assert got == want
    idxs = sorted(r["idx"] for r in out.collect())
    assert idxs == list(range(cust.count()))  # dense 0..n-1


def test_deterministic_across_runs(spark):
    cust = table(spark, SF_DIR, "customer")
    a = {(r["c_custkey"], r["idx"]) for r in with_global_index(cust, ["c_custkey"], num_partitions=5).collect()}
    b = {(r["c_custkey"], r["idx"]) for r in with_global_index(cust, ["c_custkey"], num_partitions=5).collect()}
    assert a == b


def test_more_partitions_than_rows(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "k int")
    out = {(r["k"], r["idx"]) for r in with_global_index(df, ["k"], num_partitions=16).collect()}
    assert out == {(1, 0), (2, 1), (3, 2)}


def test_no_single_partition_exchange(spark):
    # the whole point: a range exchange, never an all-to-one collapse
    cust = table(spark, SF_DIR, "customer")
    plan = (
        with_global_index(cust, ["c_custkey"], num_partitions=7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan


def test_guards(spark):
    cust = table(spark, SF_DIR, "customer")
    with pytest.raises(ValueError, match="non-empty"):
        with_global_index(cust, [])
    with pytest.raises(ValueError, match="already exists"):
        with_global_index(cust.withColumn("idx", F.lit(1)), ["c_custkey"])


# --- Morton / Z-order key ---------------------------------------------------

def test_z_value_matches_python_interleave(spark):
    from redskins_rule_spark.operators.indexing import z_value

    def ref(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = [(x, y) for x in (0, 1, 2, 3, 255, 65535) for y in (0, 1, 7, 1024)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.z for r in
           df.withColumn("z", z_value(["x", "y"])).collect()}
    for (x, y), z in got.items():
        assert z == ref(x, y), (x, y)


def test_z_value_locality(spark):
    # points close in both dims get closer z values than a far point
    from redskins_rule_spark.operators.indexing import z_value

    df = spark.createDataFrame(
        [(10, 10), (11, 11), (10, 1000)], "x long, y long"
    )
    z = [r.z for r in df.withColumn("z", z_value(["x", "y"])).collect()]
    assert abs(z[0] - z[1]) < abs(z[0] - z[2])


def test_recall_at_k_against_hand_computed(spark):
    from redskins_rule_spark.operators.similarity import recall_at_k

    exact = spark.createDataFrame(
        [("q1", i) for i in (1, 2, 3, 4)] + [("q2", i) for i in (5, 6)],
        "qid string, id int",
    )
    approx = spark.createDataFrame(
        [("q1", i) for i in (1, 2, 9, 10)] + [("q2", i) for i in (7, 8)],
        "qid string, id int",
    )
    got = {r.qid: (r.n_exact, r.n_hit, r.recall) for r in
           recall_at_k(exact, approx, "qid", "id").collect()}
    assert got == {"q1": (4, 2, 0.5), "q2": (2, 0, 0.0)}
