"""SparkSession factory.

Replaces the reference's hard-coded ``local[*]`` conf block
(reference: jobs/transform/nfl-elec-transform-v2.py:15-33) with a
config-injected factory so the same code runs on local[N] in tests and
on a real cluster in production (SURVEY.md §4.1 "local[*] pinned").

Scale posture baked in:
  * AQE on (runtime shuffle-partition coalescing, skew-join splitting).
  * shuffle.partitions sized to cores locally; on a cluster the caller
    overrides (or AQE coalesces from a high initial value).
  * UTC session timezone — required for differential testing against
    DuckDB (UTC-naive timestamps) and sane cross-cluster semantics.
  * Arrow enabled for every pandas<->Spark edge (pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 4


def get_spark(
    app_name: str = "redskins_rule_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Parameters are injection points, not policy: tests pass small
    values, production passes a cluster master URL and larger shuffle
    parallelism. Env overrides: ``SPARK_GRAFT_MASTER``,
    ``SPARK_GRAFT_CPUS``.
    """
    n = _default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{n}]")
    shuffle_partitions = shuffle_partitions or n

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # parquet TIMESTAMP(NANOS) (e.g. files written by DuckDB/arrow
        # with ns precision) is otherwise an illegal type for Spark's
        # reader; read as long and convert at the source layer.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # Run-time litter stays OUT of the repo root (VERDICT r12
        # item 7): the SQL warehouse dir and Derby's home (which owns
        # derby.log) default to the JVM's cwd — point both at /tmp.
        # Production overrides via extra_conf; nothing in the engine
        # reads these paths.
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        .config(
            "spark.driver.extraJavaOptions",
            "-Dderby.system.home=/tmp/spark_graft_derby",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # big-fixture differentials collect multi-GB results through
        # toPandas; the 1g default aborts the job at sf10 (q59).
        # Capacity knob only — production code never collects row
        # data, so this bounds harness behavior, not operator design.
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT", "1g"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
