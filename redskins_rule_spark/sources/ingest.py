"""Ingest staging (SURVEY.md §2.1 S1-S4) — the scraper edge, testable.

The reference's ingest is row-at-a-time Python: HTTP GET → soup →
nested lists → pandas → CSV (jobs/ingest/nfl.py, elections.py). Here
the *fetch* is an injectable callable (network-free deterministic fake
by default — this container has no HTTP client and tests must not hit
the network), and every cleaning step is a DataFrame op from the
operator library so it is unit-testable and runs distributed.

The scale path for S1/S2 is `sources/datasource.py` (PySpark 4 Python
DataSource API): one partition per season fetched BY EXECUTORS, not a
driver loop.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# --- S1: franchise-era URL routing (jobs/ingest/nfl.py:44-59) --------------

TEAM_ERAS: list[tuple[int, int, str]] = [
    # (first_year, last_year, slug): franchise renames change the URL
    (0, 2019, "washington-redskins"),
    (2020, 2021, "washington-football-team"),
    (2022, 9999, "washington-commanders"),
]


def schedule_url_for(year: int, base: str = "https://www.footballdb.com") -> str:
    """The reference's 3-era URL dispatch (nfl.py:44-59), as a pure
    function."""
    for lo, hi, slug in TEAM_ERAS:
        if lo <= year <= hi:
            return f"{base}/teams/nfl/{slug}/results/{year}"
    raise ValueError(f"no era covers {year}")


# --- S4: stage scraped rows as a DataFrame with the CSV-index quirk --------


def stage_rows(
    spark: SparkSession,
    rows: Sequence[tuple],
    schema,
    index_col: str = "",
) -> DataFrame:
    """Scraped rows → DataFrame with the pandas-CSV index column the
    reference's downstream depends on (''-named, load-bearing row
    order — FIXTURES.md §1). Emitted as a monotonically increasing
    row number over the given order."""
    df = spark.createDataFrame(list(rows), schema)
    w = Window.orderBy(F.monotonically_increasing_id())
    return df.withColumn(index_col, (F.row_number().over(w) - 1).cast("string"))


# --- S3: forward-fill the year key (jobs/ingest/elections.py:48-62) --------


def forward_fill_year(
    df: DataFrame,
    year_col: str = "year",
    order_col: str = "row_num",
) -> DataFrame:
    """Election rows for the same year omit the year — fill each row
    with the most recent valid 4-digit year at-or-above it. The
    reference does this in a Python loop with re.match (elections.py:
    48-62); here: rlike + last(ignorenulls) over an ordered window.

    Scale note: the window is globally ordered — correct for one
    scraped page; for many pages partition by source file first.
    """
    is_year = F.col(year_col).rlike(r"^\d{4}$")
    valid = F.when(is_year, F.col(year_col))
    w = (
        Window.orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(year_col, F.last(valid, ignorenulls=True).over(w))


# --- S2-ish: injectable fetch + parse ---------------------------------------


def fetch_schedule_rows(
    year: int,
    fetch: Callable[[str], str] | None = None,
    parse: Callable[[str, int], list[tuple]] | None = None,
) -> list[tuple]:
    """Fetch+parse one season's schedule rows.

    `fetch(url) -> html` and `parse(html, year) -> rows` are
    injectable; the default fake is deterministic (two teams, one
    game, scores derived from the year) so pipelines are testable
    without network or an HTML parser in the container.
    """
    url = schedule_url_for(year)
    if fetch is None:
        html = f"<fake schedule {year}>"
    else:
        html = fetch(url)
    if parse is None:
        return [
            (year, f"10/{year % 28 + 1}", "Opponent", str(year % 40)),
            (year, f"10/{year % 28 + 1}", "Washington", str((year + 7) % 40)),
        ]
    return parse(html, year)
