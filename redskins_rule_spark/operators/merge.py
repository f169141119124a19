"""MERGE (upsert/delete) as a declarative join — SURVEY.md §2.11 O4.

The reference's Airflow yearly catchup re-runs ingest per season and
overwrites whole objects (dags/redskins-rule-dag.py:150-160) — i.e.
its only "merge" is partition replacement. This module gives the
engine real MERGE semantics the Spark-first way: one full-outer
shuffle join on the keys + column-wise COALESCE, never a row-at-a-time
writer.

At 100 TB: both sides shuffle once on the merge keys (or zero times if
the target is bucketed on them — see sources/bucketing.py); AQE handles
skewed keys. The output is a new relation — pair with
`write_parquet(partition_by=...)` to rewrite only affected partitions
(merge-on-read rewrite, the open-format equivalent of MERGE INTO).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO target USING source ON keys:
    matched → source row replaces target row (all non-key columns);
    not matched → source row inserts;
    matched + `delete_col` true → row dropped.

    Contract: `source` has the target's columns (plus optionally
    `delete_col`), and is unique per key — duplicate source keys would
    multiply matched target rows (the same constraint SQL MERGE
    enforces with an error). Unmatched-delete rows vanish harmlessly.
    """
    missing = [c for c in target.columns if c not in source.columns]
    if missing:
        raise ValueError(f"source lacks target columns: {missing}")
    s = source.select(
        [F.col(c).alias(f"__s_{c}") for c in target.columns]
        + [F.lit(True).alias("__s_exists")]
        + ([F.col(delete_col).alias("__s_del")] if delete_col else [])
    )
    cond = reduce(
        lambda a, b: a & b,
        [target[k].eqNullSafe(s[f"__s_{k}"]) for k in keys],
    )
    joined = target.join(s, cond, "full_outer")
    if delete_col:
        joined = joined.where(~F.coalesce(F.col("__s_del"), F.lit(False)))
    # Row-presence flag, NOT coalesce: a matched source row carrying NULL
    # in a non-key column must WRITE that NULL (SQL MERGE UPDATE SET
    # semantics), not keep the stale target value.
    return joined.select(
        [
            F.when(F.col("__s_exists"), F.col(f"__s_{c}"))
            .otherwise(target[c])
            .alias(c)
            for c in target.columns
        ]
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    change_col: str = "change_type",
) -> DataFrame:
    """Change-data-capture between two snapshots of the same logical
    table: one row per key whose state changed, labeled
    'insert' / 'update' / 'delete' in `change_col`.

    Inserts and updates carry the NEW values; deletes carry the OLD
    values (there are no new ones). Unchanged keys are dropped. All
    value comparisons are null-safe (NULL -> 'x' and 'x' -> NULL are
    both updates; NULL -> NULL is unchanged).

    This is the incremental-dataset-versioning primitive a training-data
    pipeline needs between crawl snapshots: feed the output to
    `merge_upsert` (with `delete_col`) to roll a serving copy forward,
    or aggregate it for drift monitoring.

    At 100 TB: exactly one shuffle of each snapshot on the keys (a
    sort-merge join; AQE splits skewed keys); the change filter is
    evaluated in the join's projection, so unchanged rows — the vast
    majority between adjacent snapshots — never reach a second stage.
    Contract: both snapshots share a schema and are unique per key.
    """
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot schemas differ: {sorted(set(old.columns) ^ set(new.columns))}"
        )
    value_cols = [c for c in new.columns if c not in keys]
    o = old.select(
        [F.col(c).alias(f"__o_{c}") for c in old.columns]
        + [F.lit(True).alias("__o_exists")]
    )
    n = new.select(
        [F.col(c).alias(f"__n_{c}") for c in new.columns]
        + [F.lit(True).alias("__n_exists")]
    )
    cond = reduce(
        lambda a, b: a & b,
        [o[f"__o_{k}"].eqNullSafe(n[f"__n_{k}"]) for k in keys],
    )
    j = n.join(o, cond, "full_outer")
    # presence flags, not key-null checks: NULL is a legal key value
    # under eqNullSafe matching
    o_exists = F.coalesce(F.col("__o_exists"), F.lit(False))
    n_exists = F.coalesce(F.col("__n_exists"), F.lit(False))
    changed = (
        reduce(
            lambda a, b: a | b,
            [~F.col(f"__n_{c}").eqNullSafe(F.col(f"__o_{c}")) for c in value_cols],
        )
        if value_cols
        else F.lit(False)
    )
    change = (
        F.when(~o_exists, F.lit("insert"))
        .when(~n_exists, F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        j.withColumn(change_col, change)
        .where(F.col(change_col).isNotNull())
        .select(
            [
                F.when(n_exists, F.col(f"__n_{k}"))
                .otherwise(F.col(f"__o_{k}"))
                .alias(k)
                for k in keys
            ]
            + [
                F.when(F.col(change_col) != "delete", F.col(f"__n_{c}"))
                .otherwise(F.col(f"__o_{c}"))
                .alias(c)
                for c in value_cols
            ]
            + [F.col(change_col)]
        )
    )


def incremental_agg_update(
    base_agg: DataFrame,
    deltas: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """Incremental materialized-view maintenance for SUM/COUNT
    aggregates: fold a signed change set into a keyed aggregate
    WITHOUT rescanning the base table.

    `base_agg`  : keys + sum_cols + count_col (the current view).
    `deltas`    : same schema, but each row is a signed contribution —
                  inserted rows contribute (+value, +1), deleted rows
                  (-value, -1), updates one of each (or a single
                  (new-old, 0) row).

    Groups whose maintained count reaches 0 disappear (matching what a
    full recompute over the new snapshot would produce). AVG derives
    as sum/count downstream; MIN/MAX are NOT incrementally
    maintainable under deletes and need a recompute path.

    At 100 TB this is the difference between touching |changes| rows
    and touching the whole fact table: one union + one hash
    aggregation over (|view| + |changes|) rows, shuffled on the same
    view key the base aggregate already has.
    """
    missing = [c for c in [*keys, *sum_cols, count_col] if c not in base_agg.columns]
    if missing:
        raise ValueError(f"base_agg missing columns: {missing}")
    unioned = base_agg.select(*keys, *sum_cols, count_col).unionByName(
        deltas.select(*keys, *sum_cols, count_col)
    )
    aggs = [F.sum(c).alias(c) for c in sum_cols] + [
        F.sum(count_col).alias(count_col)
    ]
    return unioned.groupBy(*keys).agg(*aggs).where(F.col(count_col) > 0)


def incremental_minmax_update(
    base_view: DataFrame,
    changes: DataFrame,
    facts: DataFrame,
    keys: Sequence[str],
    value_col: str,
    op_col: str = "op",
) -> DataFrame:
    """The recompute path `incremental_agg_update`'s docstring points
    at: maintain per-key MIN/MAX under inserts AND deletes by
    recomputing ONLY the groups that need it.

    base_view : keys + min_v + max_v (current view).
    changes   : keys + value_col + op_col ('insert' | 'delete').
    facts     : the post-change fact table (source of truth for the
                targeted recompute).

    Insert-only groups fold monotonically (min/max against the
    incoming values — no recompute, |changes|-sized work). A DELETE
    only forces a recompute when it removes the CURRENT extremum —
    deleting an interior value cannot move min/max. The recompute is a
    semi-join of facts against just the affected keys: at 100 TB you
    rescan the hot groups' rows, never the table.

    Returns the refreshed keys + min_v + max_v (groups with no
    remaining facts disappear).
    """
    ks = list(keys)
    ins = (
        changes.where(F.col(op_col) == "insert")
        .groupBy(*ks)
        .agg(
            F.min(value_col).alias("_ins_min"),
            F.max(value_col).alias("_ins_max"),
        )
    )
    # deletes that touch the current extremum -> recompute that group
    dels = changes.where(F.col(op_col) == "delete").select(*ks, value_col)
    hit = (
        dels.join(base_view, ks)
        .where(
            (F.col(value_col) <= F.col("min_v"))
            | (F.col(value_col) >= F.col("max_v"))
        )
        .select(*ks)
        .distinct()
    )
    recomputed = (
        facts.join(hit, ks, "left_semi")
        .groupBy(*ks)
        .agg(F.min(value_col).alias("min_v"), F.max(value_col).alias("max_v"))
    )
    # untouched-by-recompute groups: fold inserts monotonically
    folded = (
        base_view.join(hit, ks, "left_anti")
        .join(ins, ks, "left")
        .select(
            *ks,
            F.least(F.col("min_v"), F.coalesce("_ins_min", F.col("min_v"))).alias("min_v"),
            F.greatest(F.col("max_v"), F.coalesce("_ins_max", F.col("max_v"))).alias("max_v"),
        )
    )
    # brand-new groups (inserts for keys absent from the view)
    fresh = (
        ins.join(base_view, ks, "left_anti")
        .select(
            *ks,
            F.col("_ins_min").alias("min_v"),
            F.col("_ins_max").alias("max_v"),
        )
    )
    return folded.unionByName(recomputed).unionByName(fresh)
