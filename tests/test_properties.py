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
