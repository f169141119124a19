"""Custom Python DataSource (PySpark 4 DataSource API) — S1 at scale.

The reference scrapes one season per Airflow DAG run in a driver-side
Python loop (jobs/ingest/nfl.py + yearly catchup,
dags/redskins-rule-dag.py:150-160). The Spark-native shape is a custom
batch data source: `spark.read.format("schedule").option(...)` where
EACH SEASON IS ONE INPUT PARTITION, so a 50-season backfill fans out
across executors instead of serializing through the driver.

The fetch layer is deterministic-fake by default (no network in this
container; same rows as sources.ingest.fetch_schedule_rows) — a real
deployment swaps `fetch_schedule_rows`'s fetch/parse injection. The
partition-per-season plumbing, option handling, and schema contract
are the real, tested surface.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from redskins_rule_spark.sources.ingest import fetch_schedule_rows

SCHEDULE_SCHEMA = "year int, date string, team string, final string"


class SeasonPartition(InputPartition):
    def __init__(self, year: int):
        self.year = year


class ScheduleReader(DataSourceReader):
    def __init__(self, options: dict):
        self.start = int(options.get("start", 1976))
        self.end = int(options.get("end", self.start))

    def partitions(self):
        return [SeasonPartition(y) for y in range(self.start, self.end + 1)]

    def read(self, partition: SeasonPartition):
        # executes ON THE EXECUTOR: one season's fetch+parse per task
        for row in fetch_schedule_rows(partition.year):
            yield row


class ScheduleDataSource(DataSource):
    """`spark.read.format("schedule").option("start", 1976)
    .option("end", 2020).load()` — one task per season."""

    @classmethod
    def name(cls) -> str:
        return "schedule"

    def schema(self) -> str:
        return SCHEDULE_SCHEMA

    def reader(self, schema) -> ScheduleReader:
        return ScheduleReader(self.options)

    def simpleStreamReader(self, schema) -> "ScheduleStreamReader":
        return ScheduleStreamReader(self.options)


class ScheduleStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source: offset = season year, one
    season per micro-batch — the reference's *yearly catch-up* DAG
    (dags/redskins-rule-dag.py:150-160, max_active_runs-throttled
    Airflow backfill) re-expressed as a replayable Structured
    Streaming source. Offsets are checkpointable dicts, so a restarted
    query resumes at the next un-ingested season, and
    `readBetweenOffsets` replays any committed span verbatim for
    recovery."""

    def __init__(self, options: dict):
        self.start = int(options.get("start", 1976))
        self.end = int(options.get("end", self.start))

    def initialOffset(self) -> dict:
        return {"year": self.start}

    def read(self, start: dict):
        y = int(start["year"])
        if y > self.end:
            return iter([]), start
        rows = [tuple(r) for r in fetch_schedule_rows(y)]
        return iter(rows), {"year": y + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple] = []
        for y in range(int(start["year"]), int(end["year"])):
            rows.extend(tuple(r) for r in fetch_schedule_rows(y))
        return iter(rows)


def register(spark) -> None:
    spark.dataSource.register(ScheduleDataSource)
