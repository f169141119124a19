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
