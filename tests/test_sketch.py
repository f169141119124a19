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


# -- heavy hitters -----------------------------------------------------------

from redskins_rule_spark.operators.sketch import heavy_hitters  # noqa: E402
from redskins_rule_spark.plans.explain import formatted_plan  # noqa: E402


def _zipf_df(spark, parts=8):
    # 3 heavy items (>= 10% each) drowned in a uniform tail
    rows = (
        [("hot1",)] * 300 + [("hot2",)] * 250 + [("hot3",)] * 200
        + [(f"tail{i % 400}",) for i in range(1250)]
    )
    return spark.createDataFrame(rows, "item string").repartition(parts)


def test_heavy_hitters_exact_vs_naive(spark):
    df = _zipf_df(spark)
    n = df.count()
    theta = 0.05
    naive = {
        (r.item, r["count"])
        for r in df.groupBy("item").count().where(F.col("count") >= int(n * theta)).collect()
    }
    got = {
        (r.item, r.item_count)
        for r in heavy_hitters(df, "item", theta, count_col="item_count").collect()
    }
    assert got == {(i, c) for i, c in naive}
    assert {i for i, _ in got} == {"hot1", "hot2", "hot3"}


def test_heavy_hitters_partition_invariant(spark):
    df = _zipf_df(spark)
    one = heavy_hitters(df.coalesce(1), "item", 0.08).collect()
    many = heavy_hitters(df.repartition(16), "item", 0.08).collect()
    assert {tuple(r) for r in one} == {tuple(r) for r in many}


def test_heavy_hitters_total_shortcut_and_counts_exact(spark):
    df = _zipf_df(spark)
    n = df.count()
    got = {r.item: r.item_count for r in heavy_hitters(df, "item", 0.1, total=n).collect()}
    assert got == {"hot1": 300, "hot2": 250, "hot3": 200}  # hot3 == the 0.1*2000 cutoff exactly


def test_heavy_hitters_validation(spark):
    df = _zipf_df(spark, parts=2)
    with pytest.raises(ValueError, match="threshold_frac"):
        heavy_hitters(df, "item", 0.0)
    with pytest.raises(ValueError, match="too small"):
        heavy_hitters(df, "item", 0.01, k=5)


def test_heavy_hitters_recount_is_broadcast_semi(spark):
    # pass 2 must broadcast the candidate set, not shuffle the data side
    df = _zipf_df(spark)
    plan = formatted_plan(heavy_hitters(df, "item", 0.1, total=2000))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_heavy_hitters_excludes_null_items_by_contract(spark):
    rows = [("x",)] * 50 + [(None,)] * 50
    df = spark.createDataFrame(rows, "item string")
    got = {r["item"]: r["item_count"] for r in heavy_hitters(df, "item", 0.3).collect()}
    # threshold is over the 50 non-null rows; NULL never appears
    assert got == {"x": 50}


# --- mergeable KMV states ---------------------------------------------------

def test_kmv_state_merge_is_lossless(spark):
    """Per-shard states merged == the state over all data (min-k is a
    semilattice), so the merged ESTIMATE equals the one-pass estimate."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import (
        kmv_distinct,
        kmv_estimate,
        kmv_merge,
        kmv_state,
    )

    rows = [(i % 3, f"v{i % 137}") for i in range(2000)]
    df = spark.createDataFrame(rows, "shard int, v string")
    k = 32

    # global one-pass estimate, ignoring shards
    direct = kmv_distinct(
        df.select(F.lit(1).alias("g"), "v"), ["g"], "v", k=k
    ).collect()[0]

    # per-shard states merged row-locally, then estimated
    states = kmv_state(df, ["shard"], "v", k=k).collect()
    merged = None
    import builtins

    for r in states:
        s = list(r.kmv)
        merged = s if merged is None else builtins.sorted(set(merged) | set(s))[:k]
    mdf = spark.createDataFrame([(merged,)], "st array<bigint>")
    est = mdf.select(
        kmv_estimate(F.col("st"), k).alias("e")
    ).collect()[0].e
    assert est == direct.approx_distinct

    # merge operator itself: pairwise kmv_merge == python min-k merge
    if len(states) >= 2:
        a, b = states[0].kmv, states[1].kmv
        got = spark.createDataFrame([(a, b)], "a array<bigint>, b array<bigint>").select(
            kmv_merge(F.col("a"), F.col("b"), k).alias("m")
        ).collect()[0].m
        assert list(got) == builtins.sorted(set(a) | set(b))[:k]


def test_kmv_set_estimates_accuracy(spark):
    """Union/Jaccard/intersection estimates from two states land near
    truth (deterministic given the hash family — exact tolerance)."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import kmv_set_estimates, kmv_state

    # A = 0..599, B = 300..899 -> union 900, inter 300, jaccard 1/3
    rows = [("a", f"x{i}") for i in range(600)] + [
        ("b", f"x{i}") for i in range(300, 900)
    ]
    df = spark.createDataFrame(rows, "s string, v string")
    k = 128
    st = {r.s: r.kmv for r in kmv_state(df, ["s"], "v", k=k).collect()}
    pair = spark.createDataFrame(
        [(st["a"], st["b"])], "a array<bigint>, b array<bigint>"
    )
    ests = kmv_set_estimates(F.col("a"), F.col("b"), k)
    row = pair.select(
        ests["union_est"].alias("u"),
        ests["jaccard_est"].alias("j"),
        ests["intersection_est"].alias("i"),
    ).collect()[0]
    assert abs(row.u - 900) / 900 < 0.25
    assert abs(row.j - 1 / 3) < 0.15
    assert abs(row.i - 300) / 300 < 0.4


# --- count-min sketch -------------------------------------------------------

def test_cm_sketch_never_undercounts_and_is_tight_on_hot_keys(spark):
    from collections import Counter

    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import cm_estimate, cm_state

    # skewed stream: one hot key + long tail
    vals = ["hot"] * 500 + [f"t{i}" for i in range(400)]
    truth = Counter(vals)
    df = spark.createDataFrame([(1, v) for v in vals], "g int, v string")
    st = cm_state(df, ["g"], "v", width=128, depth=4).collect()[0].cm
    sdf = spark.createDataFrame([(list(st),)], "st array<bigint>")
    for key in ["hot", "t0", "t399", "absent"]:
        est = sdf.select(
            cm_estimate(F.col("st"), key, width=128, depth=4).alias("e")
        ).collect()[0].e
        assert est >= truth[key], key                      # one-sided
        assert est <= truth[key] + len(vals) // 16, key    # eps*N slack
    # the hot key estimate is exact (its counters dominate)
    hot = sdf.select(
        cm_estimate(F.col("st"), "hot", width=128, depth=4).alias("e")
    ).collect()[0].e
    assert hot == 500 or hot <= 500 + 10


def test_cm_merge_equals_state_of_union(spark):
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import (
        cm_estimate,
        cm_merge,
        cm_state,
    )

    a_vals = [f"k{i % 7}" for i in range(100)]
    b_vals = [f"k{i % 5}" for i in range(80)]
    dfa = spark.createDataFrame([(1, v) for v in a_vals], "g int, v string")
    dfb = spark.createDataFrame([(1, v) for v in b_vals], "g int, v string")
    dfu = spark.createDataFrame(
        [(1, v) for v in a_vals + b_vals], "g int, v string"
    )
    sa = cm_state(dfa, ["g"], "v", width=64, depth=3).collect()[0].cm
    sb = cm_state(dfb, ["g"], "v", width=64, depth=3).collect()[0].cm
    su = cm_state(dfu, ["g"], "v", width=64, depth=3).collect()[0].cm
    pair = spark.createDataFrame(
        [(list(sa), list(sb))], "a array<bigint>, b array<bigint>"
    )
    merged = pair.select(cm_merge(F.col("a"), F.col("b")).alias("m")).collect()[0].m
    assert list(merged) == list(su)  # linearity: merge == union state
    est = pair.select(
        cm_estimate(cm_merge(F.col("a"), F.col("b")), "k0", width=64, depth=3).alias("e")
    ).collect()[0].e
    assert est >= a_vals.count("k0") + b_vals.count("k0")


def test_dd_quantile_relative_error_and_exact_walk(spark):
    import random

    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import dd_quantile, dd_state

    rng = random.Random(7)
    vals = [rng.lognormvariate(4.0, 1.5) for _ in range(5000)]
    df = spark.createDataFrame([(1, v) for v in vals], "g int, v double")
    alpha = 0.02
    st = dd_state(df, ["g"], "v", alpha=alpha)
    row = st.select(
        *[
            dd_quantile(F.col("dd"), q, alpha=alpha).alias(f"p{int(q * 100)}")
            for q in (0.0, 0.5, 0.9, 0.99, 1.0)
        ]
    ).collect()[0]
    s = sorted(vals)
    for q in (0.0, 0.5, 0.9, 0.99, 1.0):
        import math

        exact = s[int(math.floor(q * (len(s) - 1)))]
        est = row[f"p{int(q * 100)}"]
        assert abs(est - exact) <= alpha * exact * 1.0001, (q, est, exact)


def test_dd_merge_is_lossless_and_excludes_nonpositive(spark):
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import (
        dd_merge,
        dd_state,
        dd_total,
    )

    a_vals = [1.5, 2.5, 2.5, 100.0, 0.0, -3.0]   # 0 / negative excluded
    b_vals = [2.5, 7.0, 100.0, 100.0]
    dfa = spark.createDataFrame([(1, v) for v in a_vals], "g int, v double")
    dfb = spark.createDataFrame([(1, v) for v in b_vals], "g int, v double")
    dfu = spark.createDataFrame(
        [(1, v) for v in a_vals + b_vals], "g int, v double"
    )
    sa = dd_state(dfa, ["g"], "v").collect()[0].dd
    sb = dd_state(dfb, ["g"], "v").collect()[0].dd
    su = dd_state(dfu, ["g"], "v").collect()[0].dd
    pair = spark.createDataFrame(
        [(sa, sb)], "a map<int,bigint>, b map<int,bigint>"
    )
    out = pair.select(
        dd_merge(F.col("a"), F.col("b")).alias("m"),
        dd_total(F.col("a")).alias("na"),
    ).collect()[0]
    assert sorted(out.m.items()) == sorted(su.items())  # merge == union state
    assert out.na == 4  # 0.0 and -3.0 never entered the sketch


def test_dd_rejects_bad_params(spark):
    import pytest as _pytest

    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import dd_quantile, dd_state

    df = spark.createDataFrame([(1, 2.0)], "g int, v double")
    with _pytest.raises(ValueError):
        dd_state(df, ["g"], "v", alpha=1.5)
    with _pytest.raises(ValueError):
        dd_quantile(F.lit(None), q=1.5)


def test_cm_inner_product_bounds_join_size(spark):
    from collections import Counter

    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import cm_inner_product, cm_state

    a_vals = ["x"] * 40 + ["y"] * 10 + [f"a{i}" for i in range(50)]
    b_vals = ["x"] * 5 + ["y"] * 20 + [f"b{i}" for i in range(30)]
    ca, cb = Counter(a_vals), Counter(b_vals)
    exact = sum(ca[k] * cb[k] for k in ca)  # 40*5 + 10*20 = 400
    dfa = spark.createDataFrame([(1, v) for v in a_vals], "g int, v string")
    dfb = spark.createDataFrame([(1, v) for v in b_vals], "g int, v string")
    w, d = 128, 4
    sa = cm_state(dfa, ["g"], "v", width=w, depth=d).collect()[0].cm
    sb = cm_state(dfb, ["g"], "v", width=w, depth=d).collect()[0].cm
    pair = spark.createDataFrame(
        [(list(sa), list(sb))], "a array<bigint>, b array<bigint>"
    )
    est = pair.select(
        cm_inner_product(F.col("a"), F.col("b"), width=w, depth=d).alias("e")
    ).collect()[0].e
    assert est >= exact                                   # one-sided
    assert est <= exact + len(a_vals) * len(b_vals) // w  # εN_aN_b slack


def test_dd_weighted_equals_replication(spark):
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import dd_quantile, dd_state

    weighted = spark.createDataFrame(
        [(1, 10.0, 3), (1, 100.0, 1), (1, 50.0, 2)], "g int, v double, w int"
    )
    replicated = spark.createDataFrame(
        [(1, 10.0)] * 3 + [(1, 100.0)] + [(1, 50.0)] * 2, "g int, v double"
    )
    sw = dd_state(weighted, ["g"], "v", weight_col="w").collect()[0].dd
    sr = dd_state(replicated, ["g"], "v").collect()[0].dd
    assert sorted(sw.items()) == sorted(sr.items())
    p50 = (
        dd_state(weighted, ["g"], "v", weight_col="w")
        .select(dd_quantile(F.col("dd"), 0.5).alias("p"))
        .collect()[0].p
    )
    # rank 1+floor(0.5*5)=3 -> the third-smallest weighted value = 10
    assert abs(p50 - 10.0) <= 0.011 * 10.0


def test_dd_ks_zero_on_identical_and_one_on_disjoint(spark):
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import dd_ks, dd_state

    lo = spark.createDataFrame([(1, float(v)) for v in range(1, 200)], "g int, v double")
    hi = spark.createDataFrame([(1, float(v) * 1e6) for v in range(1, 150)], "g int, v double")
    sa = dd_state(lo, ["g"], "v").collect()[0].dd
    sb = dd_state(hi, ["g"], "v").collect()[0].dd
    pair = spark.createDataFrame([(sa, sa, sb)], "a map<int,bigint>, a2 map<int,bigint>, b map<int,bigint>")
    same = pair.select(dd_ks(F.col("a"), F.col("a2")).alias("k")).collect()[0].k
    assert same == 0.0
    disjoint = pair.select(dd_ks(F.col("a"), F.col("b")).alias("k")).collect()[0].k
    assert disjoint == 1.0  # fully separated supports


def test_dd_ks_tracks_exact_ks_on_shifted_samples(spark):
    import random

    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import dd_ks, dd_state

    rng = random.Random(3)
    xs = [rng.lognormvariate(3, 0.6) for _ in range(3000)]
    ys = [x * 1.6 for x in (rng.lognormvariate(3, 0.6) for _ in range(3000))]
    dfa = spark.createDataFrame([(1, v) for v in xs], "g int, v double")
    dfb = spark.createDataFrame([(1, v) for v in ys], "g int, v double")
    sa = dd_state(dfa, ["g"], "v").collect()[0].dd
    sb = dd_state(dfb, ["g"], "v").collect()[0].dd
    pair = spark.createDataFrame([(sa, sb)], "a map<int,bigint>, b map<int,bigint>")
    approx = pair.select(dd_ks(F.col("a"), F.col("b")).alias("k")).collect()[0].k
    # exact KS by brute force
    import bisect

    sx, sy = sorted(xs), sorted(ys)
    exact = max(
        abs(bisect.bisect_right(sx, t) / len(sx)
            - bisect.bisect_right(sy, t) / len(sy))
        for t in sx + sy
    )
    assert abs(approx - exact) < 0.03, (approx, exact)


# --- HyperLogLog -------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from redskins_rule_spark.operators.sketch import (  # noqa: E402
    hll_estimate,
    hll_harmonic_scaled,
    hll_linear_count,
    hll_merge,
    hll_n_zero,
    hll_state,
)


def _hll_py(values, p=6, hex_digits=9):
    """Reference HLL registers in plain Python (md5-prefix hash)."""
    import hashlib

    m = 1 << p
    w_bits = 4 * hex_digits - p
    regs = [0] * m
    for v in set(values):
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:hex_digits], 16)
        b, w = h % m, h >> p
        rho = (w_bits + 1) if w == 0 else (w_bits + 1 - w.bit_length())
        regs[b] = max(regs[b], rho)
    return regs


def test_hll_state_matches_python_reference(spark):
    vals = list(range(1, 2001))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = hll_state(df, [], "v").first()["hll"]
    assert list(got) == _hll_py(vals)


def test_hll_merge_equals_global_state(spark):
    # semilattice: per-shard states merged == state of the union
    vals = list(range(1, 3001))
    df = spark.createDataFrame([(v % 4, v) for v in vals], "shard int, v long")
    states = hll_state(df, ["shard"], "v")
    merged = states.agg(
        F.aggregate(
            F.collect_list("hll"),
            F.array_repeat(F.lit(0), 64),
            lambda acc, st: hll_merge(acc, st),
        ).alias("hll")
    ).first()["hll"]
    assert list(merged) == _hll_py(vals)


def test_hll_estimate_within_error_bound_and_exact_math(spark):
    # m=64 -> sigma ~ 13%; 2000 distinct should estimate within 3 sigma,
    # and the scaled harmonic sum must equal the Python-exact integer
    vals = list(range(1, 2001))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    st = hll_state(df, [], "v")
    row = st.select(
        hll_harmonic_scaled(F.col("hll")).alias("s"),
        hll_estimate(F.col("hll")).alias("e"),
        hll_n_zero(F.col("hll")).alias("z"),
    ).first()
    regs = _hll_py(vals)
    s_py = sum(1 << (31 - r) for r in regs)
    assert row["s"] == s_py
    q1 = (7213 * 64**3 * (1 << 31)) // (10000 * 64 + 10790)
    assert row["e"] == q1 // s_py
    assert abs(row["e"] - 2000) <= 0.40 * 2000
    assert row["z"] == sum(1 for r in regs if r == 0)


def test_hll_linear_count_small_range():
    import math

    assert hll_linear_count(64, 32) == 64 * math.log(2.0)
    try:
        hll_linear_count(64, 0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_hll_state_ignores_nulls_and_merge_is_idempotent(spark):
    df = spark.createDataFrame(
        [(1, 100), (1, None), (1, 200), (2, None)],
        "shard int, v long",
    )
    states = {r["shard"]: r["hll"] for r in
              hll_state(df, ["shard"], "v").collect()}
    assert list(states[1]) == _hll_py([100, 200])
    # a group with only NULLs has no identity to sketch: no state row
    # at all (the kmv_state contract, not an all-zero register array)
    assert 2 not in states
    # idempotence: merging a state with itself is the state
    st = spark.createDataFrame([(states[1],)], "hll array<int>")
    merged = st.select(hll_merge(F.col("hll"), F.col("hll")).alias("m")).first()["m"]
    assert list(merged) == list(states[1])
