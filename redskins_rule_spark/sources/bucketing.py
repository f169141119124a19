"""Bucketed tables — shuffle-free co-located joins (SURVEY.md §7.1 #9).

Big fact-to-fact joins shuffle both sides on the join key every query.
Writing both tables bucketed (and sorted) by that key moves the
shuffle to WRITE TIME, once: subsequent joins on the bucket key plan
as sort-merge joins with NO Exchange on either side — at 100 TB this
is the difference between re-shuffling terabytes per query and
streaming co-located partitions.

Rules that make it work (all enforced here):
  * both sides bucketed by the SAME columns into the SAME bucket count;
  * saveAsTable (the bucket metadata lives in the catalog — a bare
    .parquet() write silently drops bucketing);
  * join keys must be exactly the bucket columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist `df` as a bucketed (+ optionally sorted) catalog table.

    Sorting within buckets additionally removes the SORT from later
    sort-merge joins and makes min/max row-group skipping effective
    on the sort key.
    """
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key. With both
    sides bucketed identically this plans WITHOUT exchanges (verify
    with plans.explain — tests do)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=list(on), how=how)
