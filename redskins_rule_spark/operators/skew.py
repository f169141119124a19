"""Skew mitigation — salted joins (SURVEY.md §7.1 #9).

A shuffle join on a key where one value holds a large share of rows
puts that whole key in ONE task: the straggler that stalls a
1000-executor stage. AQE's skew-join splitting handles sort-merge
skew automatically (enabled in session.py); `salted_join` is the
explicit fallback for shapes AQE can't split (e.g. aggregation-after-
join pipelines, or builds where one hot build-side key explodes).

Mechanics: the large side scatters each row into one of `salt`
sub-keys; the small side replicates each row to ALL `salt` sub-keys.
The hot key's rows now land in `salt` tasks instead of one, at the
cost of replicating the small side ×salt.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join `large ⋈ small` on `on`, with the large side salted
    across `salt` sub-keys and the small side replicated to match.

    Semantically identical to `large.join(small, on, how)` for
    inner/left joins (each large row meets each matching small row
    exactly once — it carries one salt value, and the small side has
    exactly one replica per salt value).

    The salt is derived from xxhash64 over the large side's full row —
    deterministic (rerun-stable, resume-safe) yet uncorrelated with
    the join key, which is what spreads a hot key.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    lcols = [c for c in large.columns]
    l_salted = large.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(salt))
    )
    s_replicated = small.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt)])),
    )
    return l_salted.join(
        s_replicated, on=[*on, SALT_COL], how=how
    ).drop(SALT_COL)
