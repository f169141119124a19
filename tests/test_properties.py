"""Property-based tests (SURVEY.md §5.2 #4) — hypothesis-driven
randomized layouts against brute-force Python oracles.

Focus is the as-of join (the hardest semantics in the engine, §7.3):
for ANY layout of left/right event times, both physical strategies
(bucket equi-rewrite and broadcast theta) must agree with a
row-at-a-time oracle on: which right row matches (nearest within
tolerance, deterministic tiebreak), null-ness for misses, and
left-row preservation. Plus deterministic-argmax tie laws.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from redskins_rule_spark.operators.analytic import arg_max
from redskins_rule_spark.operators.asof import asof_join

EPOCH = dt.date(2000, 1, 1)

# small layouts: a handful of left anchors and right events on a
# ~60-day integer grid (collisions and ties are likely — deliberately)
day = st.integers(min_value=0, max_value=59)
layout = st.tuples(
    st.lists(day, min_size=1, max_size=6, unique=True),
    st.lists(day, min_size=0, max_size=8),
)


def _oracle(left_days, right_days, tol, direction="backward", allow_exact=True):
    """Brute-force as-of for all three directions: nearest admissible
    right row within tol; equal-distance ties for 'nearest' prefer the
    earlier (backward) right time, then smaller right id — the laws
    the Spark operator pins."""
    out = {}
    for ld in left_days:
        best = None
        for rid, rd in enumerate(right_days):
            if direction == "backward":
                ok = 0 <= ld - rd <= tol
            elif direction == "forward":
                ok = 0 <= rd - ld <= tol
            else:
                ok = abs(ld - rd) <= tol
            if not allow_exact and ld == rd:
                ok = False
            if ok:
                dist = abs(ld - rd)
                key = (dist, rd, rid) if direction == "nearest" else (dist, rid)
                if best is None or key < best:
                    best = key
        out[ld] = (best[0], best[-1]) if best else None  # (diff, rid)
    return out


@pytest.mark.parametrize("strategy", ["bucket", "broadcast"])
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=layout,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    allow_exact=st.booleans(),
)
def test_asof_join_matches_brute_force(spark, strategy, data, direction, allow_exact):
    left_days, right_days = data
    tol = 7
    left = spark.createDataFrame(
        [(d, EPOCH + dt.timedelta(days=d)) for d in left_days],
        "l_id int, l_time date",
    )
    right = spark.createDataFrame(
        [(i, EPOCH + dt.timedelta(days=d)) for i, d in enumerate(right_days)],
        "r_id int, r_time date",
    )
    got = asof_join(
        left,
        right,
        left_on="l_time",
        right_on="r_time",
        tolerance=tol,
        direction=direction,
        allow_exact_match=allow_exact,
        left_keys=["l_id"],
        tiebreak=["r_id"],
        strategy=strategy,
        diff_col="diff",
    ).collect()

    want = _oracle(left_days, right_days, tol, direction, allow_exact)
    assert len(got) == len(left_days)  # left rows preserved exactly once
    for row in got:
        expect = want[row["l_id"]]
        if expect is None:
            assert row["r_id"] is None and row["diff"] is None
        else:
            diff, rid = expect
            assert (row["diff"], row["r_id"]) == (diff, rid), (
                left_days, right_days, row)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),        # group
            st.integers(0, 5),        # score (ties likely)
            st.integers(0, 100),      # id
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda r: (r[0], r[2]),
    )
)
def test_arg_max_deterministic_tiebreak(spark, rows):
    df = spark.createDataFrame(rows, "g int, score int, id int")
    got = {
        r["g"]: r["winner"]
        for r in arg_max(
            df, ["g"], {"winner": "id"}, order_by="score", tiebreak=["id"]
        ).collect()
    }
    for g in {r[0] for r in rows}:
        members = [(s, i) for (gg, s, i) in rows if gg == g]
        best = max(members)  # (score, id) lexicographic == pinned law
        assert got[g] == best[1], (rows, g)


# --- round-3 operator invariants -----------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=8
    )
)
def test_intradoc_dedup_idempotent(spark, texts):
    """First-occurrence gram dedup is idempotent: re-deduping the kept
    sequence changes nothing."""
    import pyspark.sql.functions as F

    def dedup_tokens(toks):
        seen, out = set(), []
        for t in toks:
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    toks = df.select(
        "doc_id", F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "tok")
    ).where(F.length("tok") > 0)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id", "tok").orderBy("pos")
    firsts = (
        toks.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "tok"))).alias("pt"))
        .select("doc_id", F.transform("pt", lambda x: x["tok"]).alias("kept"))
    )
    got = {r.doc_id: list(r.kept) for r in firsts.collect()}
    for i, t in enumerate(texts):
        toks_py = [x for x in t.strip().split() if x]
        if toks_py:
            once = dedup_tokens(toks_py)
            assert got.get(i, []) == once == dedup_tokens(once)


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.sampled_from(["a", "b", "c"]),
            st.sampled_from([1.0, 2.0, 4.0]),
        ),
        min_size=3,
        max_size=40,
        unique_by=lambda r: r[0],
    )
)
def test_source_mix_invariants(spark, rows):
    """source_mix output is a subset of its input; the most-constrained
    source is kept whole; no source is oversampled past its count."""
    from redskins_rule_spark.operators.sampling import source_mix
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, "id long, source string, w double")
    out = source_mix(df, "source", "w", "id").select("id", "source", "w").collect()
    in_ids = {r[0] for r in rows}
    assert all(r.id in in_ids for r in out)
    counts: dict[str, int] = {}
    weights: dict[str, float] = {}
    for i, s, w_ in rows:
        counts[s] = counts.get(s, 0) + 1
        # operator policy on mixed per-row weights: max wins
        weights[s] = max(weights.get(s, 0.0), w_)
    unit = min(counts[s] / weights[s] for s in counts)
    kept: dict[str, int] = {}
    for r in out:
        kept[r.source] = kept.get(r.source, 0) + 1
    for s in counts:
        assert kept.get(s, 0) <= counts[s]
    # the argmin source has rate exactly 1.0 -> kept whole
    s_min = min(counts, key=lambda s: counts[s] / weights[s])
    assert kept.get(s_min, 0) == counts[s_min]


def test_incremental_agg_update_empty_delta_is_identity(spark):
    from redskins_rule_spark.operators.merge import incremental_agg_update

    base = spark.createDataFrame(
        [(1, 10.0, 2), (2, 5.0, 1)], "k long, total double, n long"
    )
    empty = spark.createDataFrame([], "k long, total double, n long")
    out = sorted(
        tuple(r) for r in incremental_agg_update(base, empty, ["k"], ["total"], "n").collect()
    )
    assert out == [(1, 10.0, 2), (2, 5.0, 1)]


# --- round-4 property tests -------------------------------------------------


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    gaps=st.lists(st.integers(min_value=1, max_value=7200), min_size=1, max_size=40),
)
def test_sessionize_invariants(spark, gaps):
    """Gap sessionization invariants for any event spacing: events are
    partitioned into sessions; within a session consecutive gaps are
    <= the threshold; the first event of every session (but the first)
    arrives > threshold after the previous event."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    GAP = 1800  # seconds
    ts, rows = 0, []
    for i, g in enumerate(gaps):
        ts += g
        rows.append((i, ts))
    df = spark.createDataFrame(rows, "event_id long, sec long")

    w = Window.partitionBy(F.lit(1)).orderBy("sec", "event_id")
    new_s = F.when(
        (F.col("sec") - F.lag("sec").over(w)) > GAP, 1
    ).when(F.lag("sec").over(w).isNull(), 1).otherwise(0)
    out = (
        df.withColumn(
            "session_no",
            F.sum(new_s).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .orderBy("sec", "event_id")
        .collect()
    )
    # python reference fold
    sess, last = [], None
    sno = 0
    for i, g in enumerate(gaps):
        if last is None or g > GAP:
            sno += 1
        sess.append(sno)
        last = g
    assert [r.session_no for r in out] == sess


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=1000.0, allow_nan=False,
                  exclude_max=True, width=32),
        min_size=1, max_size=50,
    ),
)
def test_range_bin_join_equals_between_join(spark, vals):
    """The bin-expanded equi join must agree with a plain BETWEEN join
    for arbitrary fact values incl. bin-boundary and tail values."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.workload import _Q116_BINS

    fact = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "event_id long, value double"
    )
    dim = spark.createDataFrame(_Q116_BINS, "label string, lo double, hi double")

    cap = 10
    bins = F.sequence(
        F.least(F.floor(F.col("lo") / 10).cast("int"), F.lit(cap)),
        F.least(F.ceil(F.col("hi") / 10).cast("int") - 1, F.lit(cap)),
    )
    dim_x = dim.select("label", "lo", "hi", F.explode(bins).alias("bin"))
    binned = (
        fact.withColumn(
            "bin", F.least(F.floor(F.col("value") / 10).cast("int"), F.lit(cap))
        )
        .join(F.broadcast(dim_x), "bin")
        .where((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .select("event_id", "label")
    )
    plain = (
        fact.join(
            dim,
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        ).select("event_id", "label")
    )
    assert sorted(map(tuple, binned.collect())) == sorted(map(tuple, plain.collect()))


# --- round-4 continuation: PIT join, waterfill, triangles -------------------

pit_layout = st.tuples(
    st.lists(  # dim versions: (day, value)
        st.tuples(day, st.integers(0, 99)), min_size=0, max_size=6
    ),
    st.lists(day, min_size=1, max_size=6),  # fact days
)


@given(data=pit_layout)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pit_join_matches_brute_force(spark, data):
    """pit_join == row-at-a-time SCD2 lookup (latest version with
    valid_from <= fact ts, ties by version id) for ANY layout,
    including same-day versions and facts before any version."""
    from redskins_rule_spark.operators.asof import pit_join

    dims, facts = data
    dim_rows = [
        (1, dt.datetime(2000, 1, 1) + dt.timedelta(days=d), i, float(v))
        for i, (d, v) in enumerate(dims)
    ]
    fact_rows = [
        (100 + i, 1, dt.datetime(2000, 1, 1) + dt.timedelta(days=d))
        for i, d in enumerate(facts)
    ]
    dim = spark.createDataFrame(
        dim_rows or [(None, None, None, None)],
        "user_id int, ts timestamp, event_id int, v double",
    ).where(F.col("user_id").isNotNull())
    fact = spark.createDataFrame(
        fact_rows, "fid int, user_id int, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.fid: (r.v, r.ts_effective) for r in pit_join(
        fact, dim, by=["user_id"], fact_ts="ts", dim_ts="ts",
        payload=["v"], dim_tiebreak=["event_id"],
    ).collect()}

    for i, fd in enumerate(facts):
        eligible = [
            (d, eid, v) for eid, (d, v) in enumerate(dims) if d <= fd
        ]
        if not eligible:
            assert 100 + i not in got
            continue
        d, eid, v = max(eligible, key=lambda t: (t[0], t[1]))
        assert got[100 + i][0] == float(v), (dims, facts, i)


@given(totals=st.lists(st.integers(1, 1000), min_size=1, max_size=12),
       frac=st.sampled_from([0.25, 0.5, 0.75, 0.9, 1.0]))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_budget_waterfill_invariants(spark, totals, frac):
    """Allocations never exceed a source's total, rates ∈ (0,1], and
    the budget is exhausted (within float tolerance) whenever some
    source is capped; with budget >= total everything is kept."""
    from redskins_rule_spark.operators.sampling import budget_waterfill

    rows = [(f"s{i}", t) for i, t in enumerate(totals)]
    df = spark.createDataFrame(rows, "src string, t long")
    out = budget_waterfill(df, "src", "t", frac).collect()
    assert len(out) == len(totals)
    total = sum(totals)
    budget = frac * total
    alloc = {r.src: r.allocated for r in out}
    for r in out:
        assert 0 < r.allocated <= r.total + 1e-6
        assert 0 < r.rate <= 1.0
    if frac == 1.0:
        assert all(r.allocated == r.total for r in out)
    else:
        assert abs(sum(alloc.values()) - budget) < 1e-4 * max(total, 1), (
            totals, frac, alloc,
        )


@given(edges=st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=25
))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_triangle_count_matches_brute_force(spark, edges):
    from itertools import combinations

    from redskins_rule_spark.operators.graph import triangle_count

    simple = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {v for e in simple for v in e}
    want = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if {(a, b), (b, c), (a, c)} <= simple
    )
    df = spark.createDataFrame(
        list(edges) or [(0, 0)], "src long, dst long"
    )
    row = triangle_count(df).collect()
    if not simple:
        assert row == [] or row[0].n_triangles == 0
        return
    assert (row[0].n_nodes, row[0].n_edges, row[0].n_triangles) == (
        len(nodes), len(simple), want,
    ), sorted(simple)


texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=6
)


@given(corpus_texts=texts, new_texts=texts)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_incremental_dedup_precision_and_exact_recall(
    spark, corpus_texts, new_texts
):
    """LSH banding can MISS a near-dup (probabilistic recall — that is
    the documented contract), but two properties must always hold:
    every reported match truly meets the Jaccard threshold against the
    matched corpus doc (precision), and an EXACT duplicate of a corpus
    doc with a non-empty shingle set is always caught (identical
    signature collides in every band)."""
    import re

    from redskins_rule_spark.operators.dedup import incremental_dedup_lsh

    def grams(s):
        toks = [t for t in re.split(r"\s+", s.strip()) if t]
        return {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}

    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    new_rows = [(100 + i, t) for i, t in enumerate(new_texts)]
    # plant one guaranteed exact duplicate of corpus doc 0
    new_rows.append((999, corpus_texts[0]))
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    out = {r.new_id: r for r in incremental_dedup_lsh(
        new, corpus, "doc_id", "text", threshold=0.8, max_postings=None
    ).collect()}

    all_new = dict(new_rows)
    corpus_map = dict(enumerate(corpus_texts))
    for nid, row in out.items():
        if row.is_dup:
            ga, gb = grams(all_new[nid]), grams(corpus_map[row.best_match])
            assert ga and gb
            jac = len(ga & gb) / len(ga | gb)
            assert jac >= 0.8 - 1e-9, (nid, row.best_match, jac)
    if grams(corpus_texts[0]):
        assert out[999].is_dup and out[999].best_sim == 1.0


@given(days=st.lists(day, min_size=1, max_size=20))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_islands_matches_python_fold(spark, days):
    """islands == a sequential fold over the sorted distinct days for
    ANY day multiset (duplicates collapse; runs split on gaps > 1)."""
    from redskins_rule_spark.operators.analytic import islands

    rows = [(1, (EPOCH + dt.timedelta(days=d)).isoformat()) for d in days]
    df = spark.createDataFrame(rows, "user_id int, d string")
    got = sorted(
        (str(r.island_start), str(r.island_end), r.island_days)
        for r in islands(df, ["user_id"], "d").collect()
    )

    uniq = sorted(set(days))
    runs, start, prev = [], uniq[0], uniq[0]
    for d in uniq[1:]:
        if d == prev + 1:
            prev = d
            continue
        runs.append((start, prev))
        start = prev = d
    runs.append((start, prev))
    want = sorted(
        (
            (EPOCH + dt.timedelta(days=a)).isoformat(),
            (EPOCH + dt.timedelta(days=b)).isoformat(),
            b - a + 1,
        )
        for a, b in runs
    )
    assert got == want, days


@given(docs=st.lists(
    st.lists(st.sampled_from("abcd"), min_size=0, max_size=12),
    min_size=1, max_size=5,
))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_block_dedup_matches_python_fold(spark, docs):
    """block_dedup == sequential first-occurrence fold over
    (doc_id, block_idx) order for ANY token layout (2-token blocks so
    collisions are common)."""
    from redskins_rule_spark.operators.text import block_dedup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_blocks, r.n_kept, r.kept_text)
           for r in block_dedup(df, "doc_id", "text", block_tokens=2).collect()}

    seen: set[str] = set()
    for i, toks in enumerate(docs):
        if not toks:
            assert i not in got
            continue
        blocks = [" ".join(toks[j:j + 2]) for j in range(0, len(toks), 2)]
        kept = []
        for b in blocks:
            if b not in seen:
                seen.add(b)
                kept.append(b)
        assert got[i] == (len(blocks), len(kept), " ".join(kept)), (i, docs)


@given(docs=st.lists(
    st.lists(st.sampled_from("abcd"), min_size=0, max_size=14),
    min_size=1, max_size=5,
), min_run=st.sampled_from([1, 2, 3]))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_passage_dedup_matches_python_fold(spark, docs, min_run):
    """passage_dedup == a sequential fold: global first-occurrence
    marking (same rule as block_dedup), then per-doc maximal runs of
    consecutive duplicate block indices, removing only runs of
    >= min_run blocks — for ANY token layout (2-token blocks so
    collisions are common). min_run=1 must degenerate to
    block_dedup's per-block removal."""
    from redskins_rule_spark.operators.text import passage_dedup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_blocks, r.n_kept, r.kept_text)
           for r in passage_dedup(
               df, "doc_id", "text", block_tokens=2, min_run=min_run
           ).collect()}

    seen: set[str] = set()
    for i, toks in enumerate(docs):
        if not toks:
            assert i not in got
            continue
        blocks = [" ".join(toks[j:j + 2]) for j in range(0, len(toks), 2)]
        dup = []
        for b in blocks:
            if b in seen:
                dup.append(True)
            else:
                seen.add(b)
                dup.append(False)
        # maximal runs of consecutive duplicate indices
        removed = [False] * len(blocks)
        j = 0
        while j < len(blocks):
            if not dup[j]:
                j += 1
                continue
            k = j
            while k < len(blocks) and dup[k]:
                k += 1
            if k - j >= min_run:
                for t in range(j, k):
                    removed[t] = True
            j = k
        kept = [b for b, rm in zip(blocks, removed) if not rm]
        assert got[i] == (len(blocks), len(kept), " ".join(kept)), (
            i, docs, min_run,
        )


# --- round-4-restart additions: DD sketch / bloom / profiler laws ----------


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=0.01, max_value=1e6, allow_nan=False,
                  allow_infinity=False),
        min_size=1, max_size=60,
    ),
    q=st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]),
)
def test_dd_quantile_error_bound_any_layout(spark, vals, q):
    """For ANY positive data layout and quantile, the DD estimate is
    within alpha relative error of the exact nearest-rank element,
    and the state is partitioning-independent."""
    import math

    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import dd_quantile, dd_state

    alpha = 0.05
    df = spark.createDataFrame([(1, float(v)) for v in vals], "g int, v double")
    est = (
        dd_state(df.repartition(3), ["g"], "v", alpha=alpha)
        .select(dd_quantile(F.col("dd"), q, alpha=alpha).alias("e"))
        .collect()[0]
        .e
    )
    s = sorted(vals)
    exact = s[int(math.floor(q * (len(s) - 1)))]
    assert abs(est - exact) <= alpha * exact * 1.0001, (vals, q, est, exact)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    small=st.lists(st.integers(min_value=0, max_value=10_000),
                   min_size=0, max_size=30, unique=True),
    big_n=st.integers(min_value=1, max_value=200),
)
def test_bloom_semi_join_lossless_any_layout(spark, small, big_n):
    """Bloom prune + verify equals the exact semi join for ANY key
    sets — including empty small side and disjoint ranges."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.skew import bloom_semi_join

    big = spark.createDataFrame([(i * 3,) for i in range(big_n)], "k int")
    sm = spark.createDataFrame(
        [(v,) for v in small] or [(None,)], "sk int"
    ).where(F.col("sk").isNotNull())
    got = sorted(r.k for r in bloom_semi_join(big, sm, "k", "sk",
                                              m_bits=1 << 10, k=2).collect())
    exact = sorted(r.k for r in big.join(
        sm.select(F.col("sk").alias("k")).distinct(), "k", "semi"
    ).collect())
    assert got == exact


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
            st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
        ),
        min_size=1, max_size=40,
    )
)
def test_profile_columns_matches_python_fold(spark, rows):
    """Profiler counts/extremes equal a Python fold for ANY layout of
    nulls and duplicates across two columns."""
    from redskins_rule_spark.operators.analytic import profile_columns

    df = spark.createDataFrame(rows, "a int, b int")
    got = {r.col: r for r in profile_columns(df, ["a", "b"]).collect()}
    for name, idx in (("a", 0), ("b", 1)):
        col = [r[idx] for r in rows]
        nn = [v for v in col if v is not None]
        r = got[name]
        assert r.n_rows == len(col)
        assert r.n_null == len(col) - len(nn)
        assert r.n_distinct == len(set(nn))
        if nn:
            assert (r.min_v, r.max_v) == (float(min(nn)), float(max(nn)))
            # Spark F.round is HALF_UP; Python round() is banker's —
            # exact halfway values (9/16 = 0.5625) disagree at 3dp, so
            # compare within half an ulp of the rounding grain instead.
            assert abs(r.avg_v - sum(nn) / len(nn)) <= 5e-4 + 1e-12
        else:
            assert r.min_v is None and r.avg_v is None


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    layout=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
        ),
        min_size=2, max_size=25, unique_by=lambda r: r[0],
    )
)
def test_interpolate_linear_matches_numpy(spark, layout):
    """Interior nulls match numpy.interp for ANY layout; edge nulls
    (no neighbor on one side) stay null."""
    import numpy as np

    from redskins_rule_spark.operators.analytic import interpolate_linear

    rows = [("k", t, float(v) if v is not None else None) for t, v in layout]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {r.t: r.interp for r in
           interpolate_linear(df, ["k"], "t", "v").collect()}
    known = sorted((t, v) for t, v in layout if v is not None)
    for t, v in layout:
        if v is not None:
            assert got[t] == float(v)
        elif not known or t < known[0][0] or t > known[-1][0]:
            assert got[t] is None, (t, layout)
        else:
            expect = float(np.interp(t, [x for x, _ in known],
                                     [y for _, y in known]))
            assert got[t] is not None and abs(got[t] - expect) < 1e-9, (t, layout)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(st.text(alphabet="abcdefgh0123456789", min_size=1, max_size=8),
                  min_size=1, max_size=40, unique=True),
    seed=st.integers(min_value=0, max_value=5),
    n_shards=st.integers(min_value=1, max_value=6),
)
def test_seeded_shuffle_is_permutation_any_keys(spark, keys, seed, n_shards):
    """For ANY key set: output is a true permutation (each shard's
    positions are 1..n_s), every key appears once, and the layout is
    independent of input partitioning."""
    from redskins_rule_spark.operators.sampling import seeded_shuffle

    df = spark.createDataFrame([(k,) for k in keys], "id string")
    out = seeded_shuffle(df, "id", seed=seed, n_shards=n_shards).collect()
    assert sorted(r.id for r in out) == sorted(keys)
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in out:
        assert 0 <= r.shard < n_shards
        by_shard[r.shard].append(r.pos)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), (s, keys)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    idxs=st.lists(st.integers(min_value=0, max_value=60),
                  min_size=1, max_size=40)
)
def test_int_islands_matches_python_fold(spark, idxs):
    from redskins_rule_spark.operators.analytic import int_islands

    df = spark.createDataFrame([(1, i) for i in idxs], "k int, f int")
    got = sorted(
        (r.island_start, r.island_end, r.island_len)
        for r in int_islands(df, ["k"], "f").collect()
    )
    expect = []
    run = []
    for i in sorted(set(idxs)):
        if run and i == run[-1] + 1:
            run.append(i)
        else:
            if run:
                expect.append((run[0], run[-1], len(run)))
            run = [i]
    if run:
        expect.append((run[0], run[-1], len(run)))
    assert got == sorted(expect), idxs


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=2, max_value=30),
    k=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=3),
)
def test_negative_samples_invariants_any_corpus(spark, n, k, seed):
    from redskins_rule_spark.operators.sampling import negative_samples

    df = spark.createDataFrame([(f"d{i}",) for i in range(n)], "id string")
    out = negative_samples(df, "id", k=k, seed=seed).collect()
    assert len(out) == n * k
    ids = {f"d{i}" for i in range(n)}
    for r in out:
        assert r.anchor_id != r.neg_id
        assert r.neg_id in ids and 1 <= r.j <= k


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(st.floats(min_value=0.1, max_value=1e4, allow_nan=False,
                          allow_infinity=False), min_size=2, max_size=40),
    ys=st.lists(st.floats(min_value=0.1, max_value=1e4, allow_nan=False,
                          allow_infinity=False), min_size=2, max_size=40),
)
def test_dd_ks_within_one_bucket_of_exact(spark, xs, ys):
    """Sketch-KS is within the alpha-bucket discretization error of
    the exact statistic for ANY pair of positive samples."""
    import bisect

    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import dd_ks, dd_state

    alpha = 0.02
    dfa = spark.createDataFrame([(1, float(v)) for v in xs], "g int, v double")
    dfb = spark.createDataFrame([(1, float(v)) for v in ys], "g int, v double")
    sa = dd_state(dfa, ["g"], "v", alpha=alpha).collect()[0].dd
    sb = dd_state(dfb, ["g"], "v", alpha=alpha).collect()[0].dd
    pair = spark.createDataFrame([(sa, sb)], "a map<int,bigint>, b map<int,bigint>")
    approx = pair.select(dd_ks(F.col("a"), F.col("b")).alias("k")).collect()[0].k
    sx, sy = sorted(xs), sorted(ys)
    exact = max(
        abs(bisect.bisect_right(sx, t) / len(sx)
            - bisect.bisect_right(sy, t) / len(sy))
        for t in sx + sy
    )
    # the sketch evaluates the CDF gap only at bucket boundaries; an
    # interior sup can exceed the boundary values by up to each
    # sample's heaviest single-bucket mass
    import math
    from collections import Counter

    g = (1.0 + alpha) / (1.0 - alpha)

    def max_bucket_mass(vals):
        c = Counter(math.ceil(math.log(v) / math.log(g)) for v in vals)
        return max(c.values()) / len(vals)

    slack = max_bucket_mass(xs) + max_bucket_mass(ys) + 1e-9
    assert exact - slack <= approx <= exact + slack, (approx, exact, xs, ys)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    a=st.lists(st.integers(min_value=0, max_value=500), min_size=0, max_size=25),
    b=st.lists(st.integers(min_value=0, max_value=500), min_size=0, max_size=25),
)
def test_bloom_merge_equals_union_build(spark, a, b):
    """Bloom bitmaps are a semilattice: merging per-wave filters
    equals building one filter over the union, for ANY key sets."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.skew import bloom_build, bloom_merge

    m, k = 1 << 10, 3

    def build(vals):
        df = spark.createDataFrame([(v,) for v in vals] or [(None,)], "k int")
        return bloom_build(df.where(F.col("k").isNotNull()), "k", m_bits=m, k=k)

    sa = build(a).collect()[0]["__bloom"]
    sb = build(b).collect()[0]["__bloom"]
    su = build(a + b).collect()[0]["__bloom"]
    pair = spark.createDataFrame(
        [(sa, sb)], "a map<int,bigint>, b map<int,bigint>"
    )
    merged = pair.select(bloom_merge(F.col("a"), F.col("b")).alias("m")).collect()[0].m
    assert sorted(merged.items()) == sorted(su.items()), (a, b)
