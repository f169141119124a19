"""Zero-cost pipeline metrics via Observation (SURVEY.md §2.4 A6).

The reference logs row counts with `df.count()` inside its per-file
loop — each count is a FULL extra job, quadratic re-reads over the
scan loop (nfl-elec-transform.py:40,85,90). `observe` attaches
accumulator-style aggregates to the existing plan: metrics are
collected ON THE SAME PASS as the real action, costing nothing extra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """Attach a row-count observation. Returns (df, observation);
    read `observation.get` AFTER an action on the returned df.

        df, obs = observed(clean_nfl_games(raw))
        df.write.parquet(out)
        log.info("cleaned rows: %s", obs.get["n_rows"])
    """
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs
