"""Tests: nested-explode operators (v1 ESPN path), ingest staging, and
the custom Python DataSource."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from redskins_rule_spark.operators.nested import (
    explode_into,
    flatten_arrays,
    flatten_events_v1,
)
from redskins_rule_spark.sources.datasource import register
from redskins_rule_spark.sources.ingest import (
    fetch_schedule_rows,
    forward_fill_year,
    schedule_url_for,
    stage_rows,
)

# --- nested (FIXTURES.md §5) -----------------------------------------------

SCORE = T.StructType([T.StructField("value", T.DoubleType())])
COMPETITOR = T.StructType(
    [T.StructField("id", T.StringType()), T.StructField("score", SCORE)]
)
COMPETITION = T.StructType(
    [T.StructField("competitors", T.ArrayType(COMPETITOR))]
)
EVENT = T.StructType(
    [
        T.StructField("date", T.StringType()),
        T.StructField("competitions", T.ArrayType(COMPETITION)),
    ]
)
PAYLOAD = T.StructType([T.StructField("events", T.ArrayType(EVENT))])


def _payload():
    def comp(cid, score):
        return Row(id=cid, score=Row(value=score))

    return Row(
        events=[
            Row(
                date="2004-10-31T18:00Z",
                competitions=[Row(competitors=[comp("28", 14.0), comp("9", 28.0)])],
            ),
            Row(
                date="2004-11-07T18:00Z",
                competitions=[Row(competitors=[comp("28", 17.0), comp("21", 10.0)])],
            ),
        ]
    )


def test_flatten_events_v1(spark):
    df = spark.createDataFrame([_payload()], PAYLOAD)
    out = flatten_events_v1(df).orderBy("game_date", "competitor_id")
    rows = [tuple(r) for r in out.collect()]
    assert rows == [
        ("2004-10-31T18:00Z", "28", 14.0),
        ("2004-10-31T18:00Z", "9", 28.0),
        ("2004-11-07T18:00Z", "21", 10.0),
        ("2004-11-07T18:00Z", "28", 17.0),
    ]


def test_flatten_arrays_drops_empty_by_default_keeps_with_outer(spark):
    empty = Row(events=[])
    df = spark.createDataFrame([_payload(), empty], PAYLOAD)
    assert flatten_arrays(df, ["events"]).count() == 2
    assert flatten_arrays(df, ["events"], outer=True).count() == 3


def test_explode_into(spark):
    df = spark.createDataFrame([Row(k=1, xs=[10, 20])])
    out = explode_into(df, "xs", "x")
    assert sorted(tuple(r) for r in out.collect()) == [(1, 10), (1, 20)]


# --- ingest staging --------------------------------------------------------


def test_schedule_url_eras():
    assert "washington-redskins/results/2019" in schedule_url_for(2019)
    assert "washington-football-team/results/2020" in schedule_url_for(2020)
    assert "washington-commanders/results/2022" in schedule_url_for(2022)


def test_stage_rows_materializes_index(spark):
    rows = [(2004, "10/31", "Green Bay", "28"), (2004, "10/31", "Washington", "14")]
    df = stage_rows(spark, rows, "year int, date string, team string, final string")
    got = df.orderBy("").select("", "team").collect()
    assert [(r[0], r[1]) for r in got] == [("0", "Green Bay"), ("1", "Washington")]


def test_forward_fill_year(spark):
    df = spark.createDataFrame(
        [(0, "1972", "Nixon"), (1, "", "McGovern"), (2, "1976", "Carter"), (3, None, "Ford")],
        "row_num long, year string, candidate string",
    )
    out = forward_fill_year(df).orderBy("row_num").collect()
    assert [r["year"] for r in out] == ["1972", "1972", "1976", "1976"]


def test_fetch_schedule_rows_deterministic_fake():
    rows = fetch_schedule_rows(2004)
    assert len(rows) == 2 and rows[1][2] == "Washington"
    assert rows == fetch_schedule_rows(2004)


def test_fetch_schedule_rows_injectable():
    rows = fetch_schedule_rows(
        2004,
        fetch=lambda url: f"<html>{url}</html>",
        parse=lambda html, year: [(year, "1/1", "X", "0")],
    )
    assert rows == [(2004, "1/1", "X", "0")]


# --- custom DataSource -----------------------------------------------------


def test_schedule_datasource_partitions_per_season(spark):
    register(spark)
    df = (
        spark.read.format("schedule")
        .option("start", 2000)
        .option("end", 2004)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    pdf = df.toPandas()
    assert len(pdf) == 10  # two rows per season
    assert set(pdf["year"]) == set(range(2000, 2005))
    assert (pdf.groupby("year")["team"].apply(lambda s: "Washington" in set(s))).all()


# --- streaming face of the schedule DataSource ---------------------------

def test_schedule_stream_matches_batch_across_restarts(spark, tmp_path):
    """One season per micro-batch, offsets checkpointed: five
    Trigger.Once runs over the same checkpoint must ingest exactly the
    batch-read rows (4 seasons + one empty tail batch), proving both
    the offset advance and restart-resume semantics."""
    from redskins_rule_spark.sources import datasource

    datasource.register(spark)
    batch = (
        spark.read.format("schedule").option("start", 1976).option("end", 1979).load()
    )
    want = sorted(tuple(r) for r in batch.collect())

    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    for _ in range(5):
        stream = (
            spark.readStream.format("schedule")
            .option("start", 1976)
            .option("end", 1979)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(once=True)
            .start()
        )
        q.awaitTermination(60)
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == want


def test_schedule_stream_replays_committed_span(spark):
    from redskins_rule_spark.sources.datasource import ScheduleStreamReader

    r = ScheduleStreamReader({"start": "1976", "end": "1980"})
    assert r.initialOffset() == {"year": 1976}
    rows, nxt = r.read({"year": 1976})
    rows = list(rows)
    assert nxt == {"year": 1977} and rows
    # recovery replay returns the identical span
    assert list(r.readBetweenOffsets({"year": 1976}, {"year": 1977})) == rows
    # past the end: empty batch, offset parked
    empty, parked = r.read({"year": 1981})
    assert list(empty) == [] and parked == {"year": 1981}


# --- S2: elections scrape (reference jobs/ingest/elections.py:16-41) -------

_ELECTIONS_HTML = """
<html><body>
<table>
 <thead>
  <tr><th>year</th><th>candidate</th><th>party</th><th>electoral votes</th></tr>
 </thead>
 <tbody>
  <tr><td>1788<sup>1</sup></td><td>George Washington</td><td>no party</td><td>69</td></tr>
  <tr><td>John Adams<sup><a href="#fn2">2</a></sup></td><td>Federalist</td><td>34</td></tr>
  <tr><td>1792</td><td>George Washington</td><td>Federalist</td><td>132</td></tr>
  <tr><td>John Adams</td><td>Federalist</td><td>77</td></tr>
  <tr><td>George Clinton</td><td>Democratic-Republican</td><td>50</td></tr>
  <tr><td>1796</td><td>John Adams</td><td>Federalist</td><td>71</td></tr>
  <tr><td>Thomas Jefferson</td><td>Democratic-Republican</td><td>68</td></tr>
  <tr><td>Thomas Pinckney</td><td>Federalist</td><td>59</td></tr>
  <tr><td>Aaron Burr</td><td>Antifederalist</td><td>30</td></tr>
  <tr><td>Samuel Adams</td><td>Democratic-Republican</td><td>15</td></tr>
  <tr><td>Oliver Ellsworth</td><td>Federalist</td><td>11</td></tr>
  <tr><td>1800</td><td>Thomas Jefferson</td><td>Democratic-Republican</td><td>73</td></tr>
 </tbody>
</table>
</body></html>
"""


def test_parse_elections_html_strips_superscripts():
    from redskins_rule_spark.sources.ingest import parse_elections_html

    headers, rows = parse_elections_html(_ELECTIONS_HTML)
    assert headers == ["year", "candidate", "party", "electoral votes"]
    # <sup>1</sup> footnote stripped from the year cell
    assert rows[0] == ["1788", "George Washington", "no party", "69"]
    # nested <sup><a>2</a></sup> stripped too; row is one cell short
    assert rows[1] == ["John Adams", "Federalist", "34"]
    assert len(rows) == 12


def test_scrape_elections_end_to_end(spark):
    from redskins_rule_spark.sources.ingest import (
        ELECTIONS_URL,
        scrape_elections,
    )

    seen_urls = []

    def fake_fetch(url: str) -> str:
        seen_urls.append(url)
        return _ELECTIONS_HTML

    df = scrape_elections(spark, fetch=fake_fetch)
    assert seen_urls == [ELECTIONS_URL]
    assert df.columns == ["year", "candidate", "party", "electoral votes", ""]
    out = df.orderBy(F.col("").cast("int")).collect()
    assert len(out) == 12
    # forward-filled year key, across the >9-row string-index boundary
    assert [r["year"] for r in out] == (
        ["1788"] * 2 + ["1792"] * 3 + ["1796"] * 6 + ["1800"]
    )
    # year-omitted rows keep their own cells aligned under the headers
    burr = next(r for r in out if r["candidate"] == "Aaron Burr")
    assert burr["party"] == "Antifederalist"
    assert burr["electoral votes"] == "30"
    # the ''-named CSV index survives (load-bearing row order)
    assert [r[""] for r in out] == [str(i) for i in range(12)]


def test_scrape_elections_rejects_tableless_page(spark):
    import pytest as _pytest

    from redskins_rule_spark.sources.ingest import scrape_elections

    with _pytest.raises(ValueError, match="no election table"):
        scrape_elections(spark, fetch=lambda url: "<html><body>404</body></html>")
