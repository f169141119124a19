"""As-of (temporal nearest, with tolerance) join — reference J3.

The reference expresses "nearest Washington home game ≤30 days before
each election" as a theta LEFT JOIN with `DATEDIFF BETWEEN 0 AND 30`
plus RANK()=1 (reference: jobs/transform/nfl-elec-transform-v2.py:
274-292). A theta join physically executes as BroadcastNestedLoopJoin
— O(|L|·|R|) when neither side broadcasts, a non-starter at 100 TB.

This operator rewrites backward/forward as-of-with-tolerance into an
EQUI-join on a time bucket of width = tolerance:

    left bucket  b(t)   = floor(epoch(t) / tol)
    right emits buckets b(t'), b(t')+1   (backward; -1 for forward)

Every left row's admissible window [t - tol, t] spans at most two
buckets, so the equi-join on (by_keys..., bucket) loses no matches;
the exact tolerance predicate re-filters, and a per-left-row
row_number over (|t - t'| asc, tiebreak...) keeps the nearest match.
Physical plan: shuffle-hash/sort-merge join on real keys → scales
linearly, partitions cleanly, AQE-skew-splittable. The right side is
duplicated 2× (bucket and bucket+1) — a constant factor, vs. the
quadratic BNLJ.

For a small right side, `strategy='broadcast'` keeps the reference's
theta shape but hints `broadcast(right)` so the BNLJ streams the big
side exactly once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_days(c: Column) -> Column:
    # date or timestamp → days since epoch (timestamps truncate to day
    # for day-granularity tolerance; callers needing finer grain pass
    # unit='seconds').
    return F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date"))


def _epoch_seconds(c: Column) -> Column:
    return F.unix_timestamp(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: Sequence[str] = (),
    tolerance: int | None = None,
    unit: str = "days",
    direction: str = "backward",
    allow_exact_match: bool = True,
    left_keys: Sequence[str] | None = None,
    tiebreak: Sequence[str] = (),
    how: str = "left",
    strategy: str = "bucket",
    diff_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (backward) / at-or-after (forward) / on-either-side (nearest) its
    time, within `tolerance` — the full pandas `merge_asof` direction
    surface (the reference only needs backward).

    by         : equality keys joined alongside time (asof "by" groups).
    tolerance  : max |t_left - t_right| in `unit` ('days'|'seconds').
                 Required for the bucket strategy (it is the bucket
                 width).
    allow_exact_match : False excludes right rows at exactly the left
                 time (pandas semantics: strictly before / strictly
                 after / strictly different). Equality is at `unit`
                 granularity, matching the distance computation.
    left_keys  : columns that uniquely key a left row (used to pick the
                 single nearest match). Defaults to by+[left_on] —
                 callers with duplicate times per key should pass a
                 real unique key.
    tiebreak   : right-side columns breaking equal-distance ties
                 deterministically (reference leaves this to RANK
                 nondeterminism; we pin it). For 'nearest', an
                 equal-distance before/after pair is resolved to the
                 BEFORE row first (pandas' tie rule), then `tiebreak`.
    strategy   : 'bucket' (equi-join rewrite, the scale path) or
                 'broadcast' (theta join + broadcast(right), for small
                 right sides — the reference's plan shape, made sane).
    diff_col   : if set, keep |t_left - t_right| under this name
                 (reference keeps `date_diff`).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward', or 'nearest'")
    if tolerance is None:
        raise ValueError("tolerance is required (it is also the bucket width)")
    if unit not in ("days", "seconds"):
        # a typo like 'day' silently reinterpreting tolerance as
        # seconds is a correctness bug, not a preference
        raise ValueError("unit must be 'days' or 'seconds'")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    epoch = _epoch_days if unit == "days" else _epoch_seconds

    lkeys = list(left_keys) if left_keys else [*by, left_on]
    by = list(by)

    lt, rt = F.col(left_on), F.col(right_on)
    # admissible window, in `unit`-granularity distance
    if direction == "nearest":
        in_window = F.abs(epoch(lt) - epoch(rt)) <= tolerance
    else:
        # signed distance from right event to left anchor
        signed = (
            epoch(lt) - epoch(rt)
            if direction == "backward"
            else epoch(rt) - epoch(lt)
        )
        in_window = (signed >= 0) & (signed <= tolerance)
    if not allow_exact_match:
        in_window = in_window & (epoch(lt) != epoch(rt))

    if left_on == right_on:
        raise ValueError("left_on and right_on must have distinct names")

    if strategy == "broadcast":
        # rename FIRST, then build the condition against the renamed
        # frame (referencing right["__r_k"] before the rename would be
        # an unresolved column)
        r = right
        for k in by:
            r = r.withColumnRenamed(k, f"__r_{k}")
        cond = in_window
        for k in by:
            cond = cond & (left[k] == r[f"__r_{k}"])
        joined = left.join(F.broadcast(r), cond, how).drop(*[f"__r_{k}" for k in by])
    elif strategy == "bucket":
        lb = F.floor(epoch(lt) / tolerance)
        rb = F.floor(epoch(rt) / tolerance)
        # right row can serve left buckets b(rt) and b(rt)+1 (backward);
        # nearest spans both sides → three buckets (still a constant
        # duplication factor vs. the quadratic BNLJ)
        offs = {
            "backward": [0, 1],
            "forward": [0, -1],
            "nearest": [-1, 0, 1],
        }[direction]
        r2 = right.withColumn(
            "__bucket", F.explode(F.array(*[rb + o for o in offs]))
        )
        l2 = left.withColumn("__bucket", lb)
        on = [*by, "__bucket"]
        joined = (
            l2.alias("l")
            .join(r2.alias("r"), on=on, how="inner")
            .where(in_window)
            .drop("__bucket")
        )
        if how == "left":
            # restore unmatched left rows (equi-join was inner)
            matched = joined
            joined = matched.unionByName(
                left.join(
                    matched.select(*lkeys).distinct(), on=lkeys, how="left_anti"
                ),
                allowMissingColumns=True,
            )
    else:
        raise ValueError("strategy must be 'bucket' or 'broadcast'")

    dist = F.abs(epoch(F.col(left_on)) - epoch(F.col(right_on)))
    order = [dist.asc_nulls_last()]
    if direction == "nearest":
        # equal-distance before/after pair → prefer the BEFORE row
        # (earlier right time), pandas' nearest tie rule
        order.append(epoch(F.col(right_on)).asc_nulls_last())
    order += [F.col(t).asc_nulls_last() for t in tiebreak]
    w = Window.partitionBy(*lkeys).orderBy(*order)
    out = joined.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
    out = out.drop("__rn")
    if diff_col:
        out = out.withColumn(diff_col, dist)
    return out


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    by: Sequence[str],
    fact_ts: str,
    dim_ts: str,
    payload: Sequence[str],
    dim_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Point-in-time join: attach to every fact row the dimension
    state that was current at the fact's timestamp (the SCD2 lookup a
    warehouse runs on every fact load).

    NOT a pair-enumerating theta join: dim and fact rows are tagged,
    unioned, and sorted once per `by` key; `last(payload,
    ignorenulls=True)` over (time, dim-before-fact, *tiebreak) rows
    forward-fills the dimension state onto the facts — ONE shuffle on
    the entity key and a per-key linear pass, the merge-join shape
    that survives 100 TB (the BETWEEN-join oracle is quadratic per
    key; this is O(n log n)).

    A fact at exactly the dimension's effective time sees the NEW
    state (inclusive `valid_from`, standard SCD2). `dim_tiebreak`
    orders same-timestamp dim versions (latest wins); facts with no
    preceding dim state are dropped (inner PIT semantics).
    Returns the fact columns plus `payload` and `dim_ts` (as
    `<dim_ts>_effective`) from the matched dim version.
    """
    clash = (set(payload) | {f"{dim_ts}_effective"}) & set(facts.columns)
    if clash:
        raise ValueError(
            f"pit_join: fact columns {sorted(clash)} collide with dim "
            "payload / effective-ts output names — alias them first"
        )
    fcols = [c for c in facts.columns]
    tagged_dim = dim.select(
        *by,
        F.col(dim_ts).alias("_t"),
        F.lit(0).alias("_is_fact"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
        F.col(dim_ts).alias("_p__effective"),
        *[F.col(c).alias(f"_tb_{i}") for i, c in enumerate(dim_tiebreak)],
    )
    tagged_fact = facts.select(
        *fcols,
        F.col(fact_ts).alias("_t"),
        F.lit(1).alias("_is_fact"),
    )
    u = tagged_dim.unionByName(tagged_fact, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(
            "_t",
            "_is_fact",
            *[f"_tb_{i}" for i in range(len(dim_tiebreak))],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *fcols,
        F.col("_is_fact"),
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload
        ],
        F.last("_p__effective", ignorenulls=True)
        .over(w)
        .alias(f"{dim_ts}_effective"),
    )
    return filled.where(
        (F.col("_is_fact") == 1) & F.col(f"{dim_ts}_effective").isNotNull()
    ).drop("_is_fact")
