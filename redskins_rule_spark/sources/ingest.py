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

import re
from collections.abc import Callable, Sequence
from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_YEAR_RE = re.compile(r"^\d{4}$")

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


# --- S2: elections results scrape (jobs/ingest/elections.py:16-41) ---------

ELECTIONS_URL = (
    "https://www.britannica.com/topic/"
    "United-States-Presidential-Election-Results-1788863"
)


class _ElectionsTableParser(HTMLParser):
    """Stdlib-only equivalent of the reference's soup scrape
    (jobs/ingest/elections.py:16-41): drop every ``<sup>`` subtree
    (footnote markers), collect ``<th>`` texts under ``<thead>`` as
    headers and per-``<tr>`` ``<td>`` texts under ``<tbody>`` as rows.
    Text is whitespace-stripped like ``get_text(strip=True)``.

    The container has no bs4/requests, and the parse is a pure,
    injectable edge anyway — stdlib ``html.parser`` keeps it
    dependency-free and testable offline.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.headers: list[str] = []
        self.rows: list[list[str]] = []
        self._sup_depth = 0
        self._in_thead = False
        self._in_tbody = False
        self._cell: list[str] | None = None
        self._row: list[str] | None = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "sup":
            self._sup_depth += 1
        elif tag == "thead":
            self._in_thead = True
        elif tag == "tbody":
            self._in_tbody = True
        elif tag == "tr" and self._in_tbody:
            self._row = []
        elif tag == "th" and self._in_thead:
            self._cell = []
        elif tag == "td" and self._row is not None:
            self._cell = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "sup":
            self._sup_depth = max(0, self._sup_depth - 1)
        elif tag == "thead":
            self._in_thead = False
        elif tag == "tbody":
            self._in_tbody = False
        elif tag == "th" and self._cell is not None:
            self.headers.append("".join(self._cell).strip())
            self._cell = None
        elif tag == "td" and self._cell is not None:
            if self._row is not None:
                self._row.append("".join(self._cell).strip())
            self._cell = None
        elif tag == "tr" and self._row is not None:
            if self._row:
                self.rows.append(self._row)
            self._row = None

    def handle_data(self, data: str) -> None:
        if self._cell is not None and self._sup_depth == 0:
            self._cell.append(data)


def parse_elections_html(html: str) -> tuple[list[str], list[list[str]]]:
    """HTML → (headers, rows), superscript footnotes stripped."""
    p = _ElectionsTableParser()
    p.feed(html)
    p.close()
    return p.headers, p.rows


def scrape_elections(
    spark: SparkSession,
    fetch: Callable[[str], str],
    url: str = ELECTIONS_URL,
) -> DataFrame:
    """S2 end-to-end: fetch → sup-strip table parse → staged DataFrame
    with the ''-named CSV index → forward-filled year key.

    ``fetch(url) -> html`` is injectable (tests pass a canned fixture;
    production passes a real HTTP client). Rows whose leading cell is
    not a 4-digit year inherit the nearest year above them — the
    reference's ``insert_years`` loop (elections.py:48-62), expressed
    as the `forward_fill_year` window op. Columns are the scraped
    headers, first header treated as the year column.
    """
    headers, rows = parse_elections_html(fetch(url))
    if not headers or not rows:
        raise ValueError(f"no election table parsed from {url}")
    width = len(headers)
    # Year-omitted rows are one cell short (the reference re-inserts the
    # year at position 0, elections.py:55-62); align them under a NULL
    # year so forward_fill_year can fill it, then pad/trim to width.
    padded = []
    for r in rows:
        cells = list(r) if _YEAR_RE.match(r[0] or "") else [None, *r]
        padded.append(tuple((cells + [None] * width)[:width]))
    schema = T.StructType(
        [T.StructField(h, T.StringType(), True) for h in headers]
    )
    staged = stage_rows(spark, padded, schema)
    # The ''-named CSV index is a STRING (load-bearing quirk); fill order
    # must be numeric or row "10" sorts before row "2".
    staged = staged.withColumn("_ord", F.col("").cast("int"))
    filled = forward_fill_year(staged, year_col=headers[0], order_col="_ord")
    return filled.drop("_ord")
