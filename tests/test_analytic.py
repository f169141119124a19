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


# --- round-4 continuation operators ---------------------------------------

from redskins_rule_spark.operators.analytic import (  # noqa: E402
    equi_width_histogram,
    islands,
    time_weighted_avg,
)


def test_islands_basic(spark):
    df = spark.createDataFrame(
        [(1, d) for d in ["2024-01-01", "2024-01-02", "2024-01-03",
                          "2024-01-05", "2024-01-09", "2024-01-10"]]
        + [(2, "2024-01-01")],
        "user_id int, d string",
    )
    out = islands(df, ["user_id"], "d").collect()
    got = sorted(
        (r.user_id, str(r.island_start), str(r.island_end), r.island_days)
        for r in out
    )
    assert got == [
        (1, "2024-01-01", "2024-01-03", 3),
        (1, "2024-01-05", "2024-01-05", 1),
        (1, "2024-01-09", "2024-01-10", 2),
        (2, "2024-01-01", "2024-01-01", 1),
    ]


def test_islands_dedups_same_day_events(spark):
    df = spark.createDataFrame(
        [(1, "2024-03-01"), (1, "2024-03-01"), (1, "2024-03-02")],
        "user_id int, d string",
    )
    out = islands(df, ["user_id"], "d").collect()
    assert len(out) == 1 and out[0].island_days == 2


def test_time_weighted_avg_exact(spark):
    # value 10 held for 30s, value 20 held for 10s -> (300+200)/40 = 12.5
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, 10.0),
         (1, "2024-01-01 00:00:30", 2, 20.0),
         (1, "2024-01-01 00:00:40", 3, 99.0)],   # last value carries no weight
        "user_id int, ts string, event_id int, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = time_weighted_avg(df, ["user_id"], "ts", "value",
                            tiebreak=("event_id",)).collect()
    assert len(out) == 1
    assert out[0].twa == pytest.approx(12.5)
    assert out[0].n_spans == 2


def test_time_weighted_avg_tie_pinned(spark):
    # two rows share ts; the LOWER event_id must take the zero-width span
    rows = [(1, "2024-01-01 00:00:00", 2, 100.0),
            (1, "2024-01-01 00:00:00", 1, 0.0),
            (1, "2024-01-01 00:01:00", 3, 7.0)]
    for perm in (rows, rows[::-1]):
        df = spark.createDataFrame(
            perm, "user_id int, ts string, event_id int, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = time_weighted_avg(df, ["user_id"], "ts", "value",
                                tiebreak=("event_id",)).collect()
        # event 1 gets span 0, event 2 gets the full 60s -> twa == 100
        assert out[0].twa == pytest.approx(100.0), perm


def test_histogram_partitions_all_rows(spark):
    import random

    rng = random.Random(7)
    vals = [(rng.uniform(0, 1000),) for _ in range(5000)]
    df = spark.createDataFrame(vals, "x double")
    out = equi_width_histogram(df, "x", 16).collect()
    assert sum(r.n for r in out) == 5000
    assert all(0 <= r.bin_id < 16 for r in out)
    lo = min(r.bin_lo for r in out)
    hi = max(r.bin_hi for r in out)
    assert lo == pytest.approx(min(v[0] for v in vals), abs=1e-3)
    assert hi == pytest.approx(max(v[0] for v in vals), abs=1e-3)


def test_histogram_degenerate_single_value(spark):
    df = spark.createDataFrame([(5.0,)] * 10, "x double")
    out = equi_width_histogram(df, "x", 8).collect()
    assert len(out) == 1 and out[0].bin_id == 0 and out[0].n == 10


def test_profile_columns_counts_nulls_distincts_and_moments(spark):
    from redskins_rule_spark.operators.analytic import profile_columns

    df = spark.createDataFrame(
        [(1.0, 10), (2.0, 10), (2.0, None), (None, 20)],
        "a double, b int",
    )
    rows = {r.col: r for r in profile_columns(df, ["a", "b"]).collect()}
    a, b = rows["a"], rows["b"]
    assert (a.n_rows, a.n_null, a.n_distinct) == (4, 1, 2)
    assert (a.min_v, a.max_v) == (1.0, 2.0)
    assert a.avg_v == round((1.0 + 2.0 + 2.0) / 3, 3)
    assert (b.n_rows, b.n_null, b.n_distinct) == (4, 1, 2)
    assert (b.min_v, b.max_v, b.avg_v) == (10.0, 20.0, 13.333)


def test_profile_columns_all_null_column(spark):
    from redskins_rule_spark.operators.analytic import profile_columns

    df = spark.createDataFrame([(None,), (None,)], "a double")
    r = profile_columns(df, ["a"]).collect()[0]
    assert (r.n_rows, r.n_null, r.n_distinct) == (2, 2, 0)
    assert r.min_v is None and r.avg_v is None


def test_psi_report_detects_shift_and_is_zero_on_identical(spark):
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.analytic import psi_report

    ref = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v double")
    psi_same = (
        psi_report(ref, ref, "v", bins=10)
        .agg(F.sum("term").alias("psi"))
        .collect()[0]
        .psi
    )
    assert abs(psi_same) < 1e-12  # identical distributions → 0
    shifted = spark.createDataFrame(
        [(float(i % 100) + 60.0,) for i in range(1000)], "v double"
    )
    psi_shift = (
        psi_report(ref, shifted, "v", bins=10)
        .agg(F.sum("term").alias("psi"))
        .collect()[0]
        .psi
    )
    assert psi_shift > 0.25  # gross shift → action threshold
    rows = psi_report(ref, shifted, "v", bins=10).collect()
    assert sorted(r.bin_id for r in rows) == list(range(10))  # full spine
    assert sum(r.n_cur for r in rows) == 1000  # clamping loses nothing

    import pytest as _pytest

    with _pytest.raises(ValueError):
        psi_report(ref, ref, "v", bins=1)


def test_interpolate_linear_interior_and_edges(spark):
    from redskins_rule_spark.operators.analytic import interpolate_linear

    rows = [
        ("k", 0, None),   # leading null -> stays null
        ("k", 1, 10.0),
        ("k", 2, None),   # 10 + (40-10)*(2-1)/(4-1) = 20
        ("k", 3, None),   # 30
        ("k", 4, 40.0),
        ("k", 6, None),   # trailing null -> stays null
        ("j", 1, 5.0),    # other key untouched
    ]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {(r.k, r.t): r.interp for r in
           interpolate_linear(df, ["k"], "t", "v").collect()}
    assert got[("k", 0)] is None
    assert got[("k", 1)] == 10.0
    assert got[("k", 2)] == 20.0
    assert got[("k", 3)] == 30.0
    assert got[("k", 4)] == 40.0
    assert got[("k", 6)] is None
    assert got[("j", 1)] == 5.0
    # uneven spacing weights by distance: known at t=0 (0) and t=10 (100)
    df2 = spark.createDataFrame(
        [("k", 0, 0.0), ("k", 3, None), ("k", 10, 100.0)],
        "k string, t int, v double",
    )
    out = {r.t: r.interp for r in
           interpolate_linear(df2, ["k"], "t", "v").collect()}
    assert out[3] == 30.0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        interpolate_linear(df, [], "t", "v")


def test_int_islands_runs_and_duplicates(spark):
    from redskins_rule_spark.operators.analytic import int_islands

    df = spark.createDataFrame(
        [(1, i) for i in [0, 1, 2, 5, 7, 8, 8]] + [(2, 4)],
        "k int, f int",
    )
    got = sorted(
        (r.k, r.island_start, r.island_end, r.island_len)
        for r in int_islands(df, ["k"], "f").collect()
    )
    assert got == [(1, 0, 2, 3), (1, 5, 5, 1), (1, 7, 8, 2), (2, 4, 4, 1)]


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    import random

    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.analytic import bootstrap_ci
    from redskins_rule_spark.operators.sampling import shuffle_hash

    rng = random.Random(11)
    rows = [(i, "g", rng.randint(100, 10000)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id int, g string, cents long")
    out = bootstrap_ci(
        df, ["g"], F.col("cents"), shuffle_hash("id", 7), n_boot=32
    ).collect()
    assert len(out) == 1
    r = out[0]
    true_mean = sum(c for _, _, c in rows) / len(rows)
    assert r.n == 2000 and abs(r.mean_all - true_mean) < 1e-9
    assert r.ci_lo <= r.mean_all <= r.ci_hi           # CI brackets the mean
    width = r.ci_hi - r.ci_lo
    sd = (sum((c - true_mean) ** 2 for _, _, c in rows) / len(rows)) ** 0.5
    se = sd / len(rows) ** 0.5
    assert 1.5 * se < width < 8 * se                  # sane interval scale
    # partitioning-independence (deterministic weights)
    out2 = bootstrap_ci(
        df.repartition(13), ["g"], F.col("cents"), shuffle_hash("id", 7),
        n_boot=32,
    ).collect()[0]
    assert (out2.ci_lo, out2.ci_hi) == (r.ci_lo, r.ci_hi)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        bootstrap_ci(df, ["g"], F.col("cents"), shuffle_hash("id", 7), n_boot=2)


def test_bootstrap_ci_tiny_group_survives_zero_weight_replicates(spark):
    """ADVICE r4: a 1-row group makes all-zero-weight replicates
    likely (P = e^-1 per replicate); those replicates must be DROPPED
    (not NULL means silently shortening the array) and the CI indices
    must follow the surviving count — so ci_lo/ci_hi are always real
    numbers bracketing the value."""
    from redskins_rule_spark.operators.analytic import bootstrap_ci
    from redskins_rule_spark.operators.sampling import shuffle_hash

    df = spark.createDataFrame(
        [("solo", 42, 1)] + [("big", v, 100 + v) for v in range(20)],
        "grp string, x long, k int",
    )
    out = {
        r.grp: r
        for r in bootstrap_ci(
            df.select("grp", "x", "k"), ["grp"], F.col("x"),
            shuffle_hash("k", 7), n_boot=32,
        ).collect()
    }
    solo = out["solo"]
    # a 1-row group's every surviving resample mean is exactly x
    assert solo.ci_lo == 42.0 and solo.ci_hi == 42.0
    assert solo.n == 1 and solo.mean_all == 42.0
    big = out["big"]
    assert big.ci_lo is not None and big.ci_hi is not None
    assert big.ci_lo <= big.mean_all <= big.ci_hi


def test_psi_extreme_outlier_lands_in_top_bin(spark):
    """ADVICE r4: a current value whose scaled bucket exceeds 2^31
    must clamp into the TOP bin (drift high), not wrap negative into
    bin 0 (drift low) via the non-ANSI int cast."""
    from redskins_rule_spark.operators.analytic import psi_report

    ref = spark.createDataFrame(
        [(float(v),) for v in range(100)], "v double"
    )  # range [0, 99], width (99-0)/10 = 9.9 per bin
    cur = spark.createDataFrame(
        [(1.0e12,), (50.0,)], "v double"
    )  # 1e12 scaled bucket ~ 1e11 >> 2^31
    rep = {r.bin_id: r for r in psi_report(ref, cur, "v", bins=10).collect()}
    assert rep[9].n_cur == 1  # the outlier clamped HIGH
    assert rep[0].n_cur == 0  # and did not wrap into bin 0
