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


# --- deterministic corpus shuffle (Feistel epoch permutation) ---------------

def _feistel_ref(i, seed, epoch, bits=40):
    from redskins_rule_spark.operators.indexing import (
        FEISTEL_ROUNDS,
        _FEISTEL_S1,
        _FEISTEL_S2,
    )

    half = bits // 2
    mask = (1 << half) - 1
    L, R = i >> half, i & mask
    for m, c in FEISTEL_ROUNDS:
        t = R * m + seed * _FEISTEL_S1 + epoch * _FEISTEL_S2 + c
        f = ((t >> half) ^ t) & mask
        L, R = R, L ^ f
    return (L << half) | R


def test_feistel_column_matches_python_reference(spark):
    from redskins_rule_spark.operators.indexing import feistel_key_column

    idxs = [0, 1, 2, 17, 999, 10**6, (1 << 40) - 1]
    df = spark.createDataFrame([(i,) for i in idxs], "idx long")
    got = {
        r.idx: r.k
        for r in df.withColumn(
            "k", feistel_key_column("idx", seed=7, epoch=3)
        ).collect()
    }
    for i in idxs:
        assert got[i] == _feistel_ref(i, 7, 3), i


def test_feistel_is_bijective_window(spark):
    # injectivity over a contiguous index window (bijection on the
    # full 2^40 domain follows from Feistel round invertibility)
    n = 5000
    df = spark.range(n).withColumnRenamed("id", "idx")
    from redskins_rule_spark.operators.indexing import feistel_key_column

    keys = [
        r.k
        for r in df.select(
            feistel_key_column("idx", seed=1, epoch=0).alias("k")
        ).collect()
    ]
    assert len(set(keys)) == n
    assert all(0 <= k < (1 << 40) for k in keys)


def test_feistel_sql_parity_duckdb(spark):
    import duckdb

    from redskins_rule_spark.operators.indexing import feistel_key_sql

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT i, {feistel_key_sql('i', seed=7, epoch=3)} AS k "
        "FROM (SELECT unnest(generate_series(0, 999)) AS i)"
    ).fetchall()
    for i, k in rows:
        assert k == _feistel_ref(i, 7, 3), i


def test_feistel_out_of_domain_index_raises_by_name(spark):
    # ADVICE r12: an index >= 2^bits (or negative) would silently
    # break the bijection — it must raise BY NAME at execution time,
    # not produce a duplicate shuffle key.
    import pytest

    from redskins_rule_spark.operators.indexing import feistel_key_column

    for bad in (1 << 40, -1):
        df = spark.createDataFrame([(bad,)], "idx long")
        with pytest.raises(Exception, match="feistel index out of domain"):
            df.select(feistel_key_column("idx", seed=1, epoch=0)).collect()
    # boundary values stay in-domain and guarded-path results match
    # the unguarded reference algebra
    ok = spark.createDataFrame([(0,), ((1 << 40) - 1,)], "idx long")
    got = {r.idx: r.k for r in ok.withColumn(
        "k", feistel_key_column("idx", seed=1, epoch=0)).collect()}
    assert got == {i: _feistel_ref(i, 1, 0) for i in (0, (1 << 40) - 1)}


def test_corpus_shuffle_positions_dense_and_epoch_dependent(spark):
    from redskins_rule_spark.operators.indexing import corpus_shuffle

    df = spark.range(400).withColumnRenamed("id", "idx")
    e0 = corpus_shuffle(df, "idx", seed=5, epoch=0, num_partitions=8)
    rows = e0.collect()
    assert sorted(r.epoch_pos for r in rows) == list(range(400))
    # position == rank of the Feistel key (reproducible contract)
    by_key = sorted(rows, key=lambda r: r.shuffle_key)
    assert [r.epoch_pos for r in by_key] == list(range(400))
    # a different epoch is a genuinely different permutation
    e1 = corpus_shuffle(df, "idx", seed=5, epoch=1, num_partitions=8)
    p0 = {r.idx: r.epoch_pos for r in rows}
    p1 = {r.idx: r.epoch_pos for r in e1.collect()}
    assert p0 != p1
    # same (seed, epoch) reproduces bit-identically
    p0b = {
        r.idx: r.epoch_pos
        for r in corpus_shuffle(
            df, "idx", seed=5, epoch=0, num_partitions=8
        ).collect()
    }
    assert p0 == p0b


def test_corpus_shuffle_single_range_exchange(spark):
    # scale contract: ONE range exchange, no single-partition window,
    # no global sort on the driver
    from redskins_rule_spark.operators.indexing import corpus_shuffle

    df = spark.range(1000).withColumnRenamed("id", "idx")
    plan = (
        corpus_shuffle(df, "idx", seed=5, epoch=0, num_partitions=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # AQE prints the plan twice (Initial + Final) — examine the final
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1
    assert "rangepartitioning" in final.lower()
    assert "SinglePartition" not in plan
    assert "Window" not in plan


def test_feistel_guards(spark):
    import pytest as _pytest

    from redskins_rule_spark.operators.indexing import (
        corpus_shuffle,
        feistel_key_column,
    )

    with _pytest.raises(ValueError, match="bits"):
        feistel_key_column("idx", seed=0, epoch=0, bits=41)
    with _pytest.raises(ValueError, match="seed/epoch"):
        feistel_key_column("idx", seed=1 << 20, epoch=0)
    df = spark.range(3).withColumnRenamed("id", "idx")
    with _pytest.raises(ValueError, match="already exists"):
        corpus_shuffle(df.withColumn("epoch_pos", F.lit(1)), "idx")
