"""Interval-overlap join (operators/interval.py): bucketized equi-join
plan, differential-tested against the naive all-pairs definition."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from redskins_rule_spark.operators.interval import interval_join
from redskins_rule_spark.plans.explain import formatted_plan

EPOCH = dt.datetime(2024, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=sec)


def _frame(spark, rows, prefix):
    return spark.createDataFrame(
        [(i, _ts(s), _ts(e)) for i, (s, e) in enumerate(rows)],
        f"{prefix}_id bigint, {prefix}_s timestamp, {prefix}_e timestamp",
    )


def _brute(a_rows, b_rows):
    return {
        (i, j)
        for i, (s1, e1) in enumerate(a_rows)
        for j, (s2, e2) in enumerate(b_rows)
        if s1 <= e2 and s2 <= e1
    }


def _rand_rows(rng, n, span, max_len):
    return [
        (s := rng.uniform(0, span), s + rng.uniform(0, max_len))
        for _ in range(n)
    ]


@pytest.mark.parametrize("bucket_us", [1_000_000, 7_000_000, 60_000_000])
def test_matches_brute_force_across_bucket_widths(spark, bucket_us):
    rng = random.Random(42)
    a_rows = _rand_rows(rng, 80, span=600, max_len=30)
    b_rows = _rand_rows(rng, 60, span=600, max_len=50)
    got = interval_join(
        _frame(spark, a_rows, "a"),
        _frame(spark, b_rows, "b"),
        ("a_s", "a_e"),
        ("b_s", "b_e"),
        bucket_width_us=bucket_us,
    )
    pairs = {(r["a_id_a"], r["b_id_b"]) for r in got.collect()}
    assert pairs == _brute(a_rows, b_rows)
    # first-shared-bucket claiming means exactly-once, not just set-equal
    assert got.count() == len(pairs)


def test_touching_endpoints_are_closed_bounds(spark):
    a = _frame(spark, [(0, 10)], "a")
    b = _frame(spark, [(10, 20), (20.000001, 30)], "b")
    got = [
        (r["a_id_a"], r["b_id_b"])
        for r in interval_join(
            a, b, ("a_s", "a_e"), ("b_s", "b_e"), bucket_width_us=5_000_000
        ).collect()
    ]
    assert got == [(0, 0)]


def test_equi_keys_partition_the_match_space(spark):
    a = spark.createDataFrame(
        [(1, "u1", _ts(0), _ts(100)), (2, "u2", _ts(0), _ts(100))],
        "a_id bigint, user string, a_s timestamp, a_e timestamp",
    )
    b = spark.createDataFrame(
        [(7, "u1", _ts(50), _ts(60))],
        "b_id bigint, user string, b_s timestamp, b_e timestamp",
    )
    got = interval_join(
        a, b, ("a_s", "a_e"), ("b_s", "b_e"), on=["user"]
    ).collect()
    assert [(r["user"], r["a_id_a"], r["b_id_b"]) for r in got] == [
        ("u1", 1, 7)
    ]


def test_null_and_inverted_intervals_dropped(spark):
    a = spark.createDataFrame(
        [(1, _ts(10), _ts(5)), (2, None, _ts(5)), (3, _ts(0), _ts(100))],
        "a_id bigint, a_s timestamp, a_e timestamp",
    )
    b = _frame(spark, [(0, 200)], "b")
    got = interval_join(a, b, ("a_s", "a_e"), ("b_s", "b_e")).collect()
    assert [r["a_id_a"] for r in got] == [3]


def test_max_buckets_guard_raises(spark):
    a = _frame(spark, [(0, 10_000)], "a")  # 10k buckets at 1s width
    b = _frame(spark, [(0, 1)], "b")
    bad = interval_join(
        a,
        b,
        ("a_s", "a_e"),
        ("b_s", "b_e"),
        bucket_width_us=1_000_000,
        max_buckets=100,
    )
    with pytest.raises(Exception, match="max_buckets"):
        bad.collect()


def test_plan_is_equi_join_not_bnlj(spark):
    a = _frame(spark, [(0, 10), (20, 30)], "a")
    b = _frame(spark, [(5, 15)], "b")
    plan = formatted_plan(
        interval_join(a, b, ("a_s", "a_e"), ("b_s", "b_e"))
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# --- interval union (coverage) ----------------------------------------------

def test_merge_intervals_basic(spark):
    from redskins_rule_spark.operators.interval import merge_intervals

    df = spark.createDataFrame(
        [
            (1, 0, 10), (1, 5, 12), (1, 12, 15),  # overlap + touching -> one run
            (1, 20, 25),                          # gap -> new run
            (2, 3, 4),
        ],
        "k int, s long, e long",
    )
    out = {(r.k, r.merged_start): (r.merged_end, r.n_source, r.covered)
           for r in merge_intervals(df, ["k"], "s", "e").collect()}
    assert out == {
        (1, 0): (15, 3, 15),
        (1, 20): (25, 1, 5),
        (2, 3): (4, 1, 1),
    }


def test_merge_intervals_contained_and_duplicate(spark):
    from redskins_rule_spark.operators.interval import merge_intervals

    df = spark.createDataFrame(
        [(1, 0, 100), (1, 10, 20), (1, 0, 100), (1, 100, 101)],
        "k int, s long, e long",
    )
    out = merge_intervals(df, ["k"], "s", "e").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.merged_start, r.merged_end, r.n_source, r.covered) == (0, 101, 4, 101)


def test_merge_intervals_matches_python_fold_random(spark):
    import random

    from redskins_rule_spark.operators.interval import merge_intervals

    rng = random.Random(23)
    rows = []
    for _ in range(60):
        s = rng.randint(0, 50)
        rows.append((rng.randint(1, 3), s, s + rng.randint(0, 10)))
    df = spark.createDataFrame(rows, "k int, s long, e long")
    got = sorted(
        (r.k, r.merged_start, r.merged_end)
        for r in merge_intervals(df, ["k"], "s", "e").collect()
    )

    want = []
    bykey: dict = {}
    for k, s, e in rows:
        bykey.setdefault(k, []).append((s, e))
    for k, ivs in bykey.items():
        ivs.sort()
        cs, ce = ivs[0]
        for s, e in ivs[1:]:
            if s > ce:
                want.append((k, cs, ce))
                cs, ce = s, e
            else:
                ce = max(ce, e)
        want.append((k, cs, ce))
    assert got == sorted(want)
