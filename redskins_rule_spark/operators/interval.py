"""Interval-overlap join: pairs of rows whose [start, end] intervals
intersect — the genomics / incident-correlation / ad-attribution join
Spark has no native operator for.

The naive formulation `a.start <= b.end AND b.start <= a.end` is a
pure theta join: Spark can only BroadcastNestedLoop it, which is
O(|A|·|B|) and a non-starter at scale. This module uses temporal
bucketing to turn it into an equi join:

  1. choose a bucket width W (microseconds);
  2. explode each interval into the buckets it covers
     (`sequence(floor(s/W), floor(e/W))`);
  3. equi-join on bucket id (plus any caller equi keys);
  4. keep pairs that truly overlap;
  5. emit each pair exactly once — only from the FIRST bucket both
     intervals share, `floor(max(s_a, s_b)/W)` — so no global
     DISTINCT shuffle is ever needed.

At 100 TB this is one shuffle of each side, keyed by (bucket, keys),
with per-task work proportional to genuine temporal co-location.
Pick W near the typical interval length: too small explodes long
intervals into many buckets (blow-up guarded by `max_buckets`), too
large degrades toward all-pairs within a bucket. Long-tail intervals
are the skew hazard — cap them upstream or raise W.

No counterpart in the reference (its only join is an equi year join,
jobs/transform/nfl_elections.py); this is north-star surface for
event-stream correlation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redskins_rule_spark.functions.dates import epoch_us


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    on: Sequence[str] = (),
    bucket_width_us: int = 3_600_000_000,
    max_buckets: int = 1_000,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Join rows whose time intervals overlap (closed bounds,
    `s_a <= e_b AND s_b <= e_a`).

    left_bounds / right_bounds : (start_col, end_col) timestamp columns.
    on              : optional extra equi-key columns (same name both
                      sides) — e.g. user_id for per-entity correlation.
    bucket_width_us : temporal bucket width in microseconds.
    max_buckets     : hard cap on buckets one interval may span; an
                      interval longer than max_buckets*W raises at plan
                      execution (guards the explode blow-up a stray
                      open-ended interval would cause).
    suffixes        : appended to every non-`on` column of each side.

    Output: all `on` columns once, then left columns suffixed, then
    right columns suffixed. Rows with NULL bounds or end < start are
    dropped (no interval to speak of).
    """
    ls, le = left_bounds
    rs, re_ = right_bounds
    sa, sb = suffixes
    if sa == sb:
        raise ValueError("suffixes must differ")

    def floor_bucket(x):  # exact integer floor-div (pmod keeps it sign-safe)
        return ((x - F.pmod(x, F.lit(bucket_width_us))) / bucket_width_us).cast(
            "long"
        )

    def prep(df: DataFrame, s: str, e: str, suf: str) -> DataFrame:
        start_us = epoch_us(s)
        end_us = epoch_us(e)
        b_start, b_end = floor_bucket(start_us), floor_bucket(end_us)
        guarded = F.when(
            b_end - b_start < F.lit(max_buckets),
            F.sequence(b_start, b_end),
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"interval spans more than max_buckets={max_buckets} "
                    f"buckets of {bucket_width_us}us; raise bucket_width_us "
                    "or cap interval lengths upstream"
                )
            )
        )
        out = (
            df.where(F.col(s).isNotNull() & F.col(e).isNotNull())
            .where(end_us >= start_us)
            .select(
                *[F.col(k) for k in on],
                *[
                    F.col(c).alias(f"{c}{suf}")
                    for c in df.columns
                    if c not in on
                ],
                start_us.alias(f"__s{suf}"),
                end_us.alias(f"__e{suf}"),
                F.explode(guarded).alias("__bucket"),
            )
        )
        return out

    l = prep(left, ls, le, sa)
    r = prep(right, rs, re_, sb)
    join_keys = ["__bucket", *on]
    joined = l.join(r, join_keys, "inner")
    overlap = (F.col(f"__s{sa}") <= F.col(f"__e{sb}")) & (
        F.col(f"__s{sb}") <= F.col(f"__e{sa}")
    )
    # claim each pair in the first shared bucket only: no DISTINCT pass
    lo = F.greatest(F.col(f"__s{sa}"), F.col(f"__s{sb}"))
    first_shared = ((lo - F.pmod(lo, F.lit(bucket_width_us))) / bucket_width_us).cast(
        "long"
    )
    return joined.where(overlap & (F.col("__bucket") == first_shared)).drop(
        "__bucket", f"__s{sa}", f"__e{sa}", f"__s{sb}", f"__e{sb}"
    )


def merge_intervals(
    df: DataFrame,
    partition_by: list[str],
    start_col: str,
    end_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Union of overlapping/adjacent intervals per key — coverage
    analytics (total on-air time, sensor uptime, span dedup): merge
    [s,e] intervals that overlap or touch into maximal runs.

    The classic one-window trick: sort per key by (start, *tiebreak);
    a NEW run starts where start > running-max(end) of all PRIOR
    intervals; the run id is a running sum of those flags; one hash
    agg per run finishes it. One per-key window + one agg — no
    self-join, no explode to points (which would blow an interval of
    a year into 3·10⁷ second-rows).

    Returns (*partition_by, merged_start, merged_end, n_source,
    covered) where covered = merged_end − merged_start (caller's units
    — pass numeric or epoch-cast columns).
    """
    from pyspark.sql import Window

    s, e = F.col(start_col), F.col(end_col)
    order = [s, *[F.col(c) for c in (tiebreak or [])]]
    w = Window.partitionBy(*partition_by).orderBy(*order)
    prior_max_end = F.max(e).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new_run",
        F.when(prior_max_end.isNull() | (s > prior_max_end), 1).otherwise(0),
    ).withColumn(
        "_run",
        F.sum("_new_run").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy(*partition_by, "_run")
        .agg(
            F.min(s).alias("merged_start"),
            F.max(e).alias("merged_end"),
            F.count(F.lit(1)).alias("n_source"),
        )
        .withColumn("covered", F.col("merged_end") - F.col("merged_start"))
        .drop("_run")
    )
