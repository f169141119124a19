"""Election-day generation (SURVEY.md §2.8 F12).

The reference computes "first Tuesday after the first Monday of
November, every 4 years" driver-side in a Python loop and ships it to
Spark through pandas (reference: jobs/transform/nfl-elec-transform-v2.py:
153-174). Here it is a native `spark.range` plan — no driver data, no
pandas hop — and the pure-Python version is kept as the cross-check
oracle for tests.

Date math: with Spark's dayofweek (Sunday=1 ... Saturday=7), for
nov1 = Nov 1 of year y the first Monday falls on day-of-month
1 + ((9 - dayofweek(nov1)) % 7); election day is the next day.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def election_days(
    spark: SparkSession, start: int = 1976, end: int | None = None, step: int = 4
) -> DataFrame:
    """DataFrame of (year int, elec_date date), distributed generation."""
    end = end or _dt.date.today().year
    nov1 = F.make_date(F.col("id"), F.lit(11), F.lit(1))
    first_monday = F.date_add(nov1, (F.lit(9) - F.dayofweek(nov1)) % 7)
    return (
        spark.range(start, end + 1, step)
        .select(
            F.col("id").cast("int").alias("year"),
            F.date_add(first_monday, 1).alias("elec_date"),
        )
    )


def election_days_py(start: int = 1976, end: int | None = None, step: int = 4) -> list[_dt.date]:
    """Pure-Python oracle (mirrors the reference's loop semantics)."""
    end = end or _dt.date.today().year
    out = []
    for year in range(start, end + 1, step):
        d = _dt.date(year, 11, 1)
        # weekday(): Monday=0 ... Sunday=6
        first_monday = d + _dt.timedelta(days=(7 - d.weekday()) % 7)
        out.append(first_monday + _dt.timedelta(days=1))
    return out


def epoch_us(col) -> F.Column:
    """Epoch microseconds for TIMESTAMP *or* TIMESTAMP_NTZ input.

    `F.unix_micros` rejects TIMESTAMP_NTZ (the type Spark infers for
    parquet written with isAdjustedToUTC=false, e.g. the driver's
    events.ts). Casting NTZ -> TIMESTAMP first is wall-clock identity
    under the engine's pinned UTC session timezone (session.py), and a
    no-op for LTZ input, so this is safe for both. Interval arithmetic
    built on it (differences of epoch_us) is timezone-invariant even
    off-UTC because the session offset cancels.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
