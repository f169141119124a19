"""Cleaning / scalar transforms (SURVEY.md §2.2 P1-P9, §2.8 F1-F18).

Each helper returns a Column (composable inside select/withColumn) or a
DataFrame transform. All are native Catalyst expressions — they inline
into whole-stage codegen and never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# reference: the regex used to pull an M/d day-month out of a messy
# scraped date cell (nfl-elec-transform-v2.py:68-69)
DAY_MONTH_PATTERN = r"((0?[1-9]|1[0-2])/([12][0-9]|3[01]|0?[1-9]))"


def extract_day_month(col: Column | str) -> Column:
    """F1: regexp-extract `M/d` from a messy date cell."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, DAY_MONTH_PATTERN, 0)


def assemble_mdy_date(day_month: Column | str, year: Column | str) -> Column:
    """F2+F10: 'M/d' + year → date (reference :70,80)."""
    dm = F.col(day_month) if isinstance(day_month, str) else day_month
    y = F.col(year) if isinstance(year, str) else year
    return F.to_date(F.concat(dm, F.lit("/"), y.cast("string")), "M/d/yyyy")


def strip_parenthetical(col: Column | str) -> Column:
    """F3+F4: drop a trailing '(...)' annotation — split on '(' and
    keep segment 1 (reference :81-82). Trailing whitespace trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.element_at(F.split(c, r"\("), 1))


def digits_to_long(col: Column | str) -> Column:
    """F5+F16: '40,825,839' → 40825839L via translate+cast
    (reference :145)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, ",", "").cast("long")


def filter_unplayed(df: DataFrame, col: str = "final", marker: str = "--") -> DataFrame:
    """P2: drop rows whose score cell contains the unplayed marker
    (reference jobs/ingest/nfl.py:81-84)."""
    return df.filter(~F.col(col).contains(marker))


def filter_regular_season(df: DataFrame, col: str = "date", max_len: int = 10) -> DataFrame:
    """P3: keep rows with short date cells — postseason rows carry
    longer strings (reference :73-78)."""
    return df.filter(F.length(col) < max_len)


def rename_index_column(df: DataFrame, to: str = "row_num") -> DataFrame:
    """P9 + §1.4 quirk: the pandas CSV index arrives as a column named
    '' and is load-bearing (row order encodes home/away)."""
    return df.withColumnRenamed("", to) if "" in df.columns else df


def categorize(col: Column | str, mapping: list[tuple[Column, str]], default: str) -> Column:
    """F15: CASE WHEN chain builder."""
    c = None
    for cond, value in mapping:
        c = F.when(cond, value) if c is None else c.when(cond, value)
    return (c.otherwise(default) if c is not None else F.lit(default))
