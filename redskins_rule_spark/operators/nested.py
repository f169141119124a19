"""Nested-type operators (SURVEY.md §2.8 F19-F20 — the v1 ESPN path).

The reference's v1 transform consumes a deeply nested scrape payload
(`events: array<struct<..., competitions: array<struct<competitors:
array<struct<id, score: struct<value>>>>>>>`) with a chain of three
explodes plus struct-field projections
(jobs/transform/nfl-elec-transform.py:42-44,74-83). Generalized here:

  * `explode_into`   — one explode step, keeping sibling columns;
  * `flatten_arrays` — chain of explode steps down a path of nested
    array fields;
  * `flatten_events_v1` — the reference's exact flatten, as a test-
    pinned composition.

Scale notes: explode multiplies rows — project away unused columns
FIRST (column pruning does not reach through a struct you still
carry); for positional context use posexplode; `explode` drops
rows with empty/null arrays (reference relied on this), pass
outer=True to keep them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_into(
    df: DataFrame, array_col: str, out: str, outer: bool = False
) -> DataFrame:
    """Explode one array column into `out`, dropping the source col."""
    fn = F.explode_outer if outer else F.explode
    return df.withColumn(out, fn(F.col(array_col))).drop(array_col)


def flatten_arrays(
    df: DataFrame, path: list[str], prefix: str = "x_", outer: bool = False
) -> DataFrame:
    """Chain-explode down a path of nested array-of-struct fields.

    `path=['events', 'competitions', 'competitors']` yields columns
    `x_events, x_competitions, x_competitors` where each is one
    element struct of its level (reference :42-44 shape).
    """
    out = df
    current: str | None = None
    for field in path:
        src = field if current is None else f"{current}.{field}"
        current = f"{prefix}{field}"
        out = out.withColumn(current, (F.explode_outer if outer else F.explode)(src))
        if field in out.columns:
            out = out.drop(field)
    return out


def flatten_events_v1(df: DataFrame) -> DataFrame:
    """The reference v1 flatten (:42-44,74-83): one row per competitor
    with (game_date, competitor_id, score_value)."""
    ex = flatten_arrays(df, ["events", "competitions", "competitors"], prefix="exp_")
    return ex.select(
        F.col("exp_events.date").alias("game_date"),
        F.col("exp_competitors.id").alias("competitor_id"),
        F.col("exp_competitors.score.value").alias("score_value"),
    )
