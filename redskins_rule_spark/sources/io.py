"""Schema-enforced IO layer (SURVEY.md §2.1 S5-S12).

The reference lists object-store blobs and unions per-file reads in a
Python loop (reference: jobs/transform/nfl-elec-transform-v2.py:42-65)
— an O(n_files)-deep Union plan that defeats partition discovery. Here
every read is a single (optionally multi-path / glob) scan so Catalyst
plans ONE FileScan with pushdown + pruning, and sinks are distributed
``df.write`` (never ``toPandas().to_parquet`` through the driver,
reference :354).

At 100 TB: globbed parquet scans parallelize listing, prune partitions
from directory layout, and push predicates to row-group statistics —
all lost with loop-unions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _paths(path: str | Sequence[str]) -> list[str]:
    return [path] if isinstance(path, str) else list(path)


def read_parquet(
    spark: SparkSession,
    path: str | Sequence[str],
    schema: StructType | str | None = None,
) -> DataFrame:
    """Single-scan parquet read over one or many paths/globs.

    Replaces the reference's list-blobs + per-file read + unionByName
    accumulator (S7/S9/U1): ``read_parquet(spark, "gs://b/raw/v2/*")``.
    An explicit schema skips footer-merging inference and acts as a
    contract check (mismatched files fail fast instead of silently
    widening types).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(*_paths(path))


def read_csv(
    spark: SparkSession,
    path: str | Sequence[str],
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan (S4/S5). Explicit schema preferred: inference scans the
    data twice and is banned from production paths."""
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(_paths(path))


def read_json(
    spark: SparkSession,
    path: str | Sequence[str],
    schema: StructType | str | None = None,
    multiline: bool = False,
    **options: str,
) -> DataFrame:
    """JSON scan (S5, v1 nested-ESPN variant). With an explicit nested
    schema this reads arbitrarily nested array<struct<...>> payloads
    (FIXTURES.md §5) in one pass."""
    reader = spark.read.options(multiLine=str(multiline).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(_paths(path))


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """Distributed parquet sink (replaces S11 driver-side sink).

    ``partition_by`` yields a directory layout Catalyst can
    partition-prune on later scans — the idempotent per-partition
    write that replaces the reference's Airflow yearly-catchup
    re-ingest (SURVEY.md §2.11 O4).
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_orc(
    spark: SparkSession,
    path: str | Sequence[str],
    schema: StructType | str | None = None,
) -> DataFrame:
    """ORC scan — same single-scan contract as `read_parquet` (ORC
    carries the same row-group statistics for predicate pushdown and
    is the common interchange format for Hive-era warehouses)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(*_paths(path))


_SINK_FORMATS = ("parquet", "orc", "csv", "json")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    **options: str,
) -> None:
    """Distributed sink for any supported format (parquet | orc | csv
    | json). CSV covers the reference's staging sink (S4) without the
    driver-side pandas hop; `partition_by` gives every format the
    partition-pruned directory layout. Executors write in parallel —
    one file per partition, so `coalesce` first if a single file is
    required."""
    if fmt not in _SINK_FORMATS:
        raise ValueError(f"unsupported sink format: {fmt!r} (use {_SINK_FORMATS})")
    writer = df.write.mode(mode).options(**options)
    if fmt == "csv":
        writer = writer.option("header", options.get("header", "true"))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md).

    Columns stored as parquet TIMESTAMP(NANOS) arrive as long (see
    session conf `nanosAsLong`) and are normalized back to timestamp
    (microsecond truncation — matches engines that read nanos
    natively and truncate to µs).
    """
    try:  # runtime SQL conf — make driver-owned sessions nanos-safe too
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = read_parquet(spark, f"{sf_dir}/{name}.parquet")
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    for col in ("ts",):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            # integer `div`, NOT `/`: nanosecond epochs (~1.7e18)
            # exceed double's 2^53 mantissa, so float division is off
            # by ±1µs after floor
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df
