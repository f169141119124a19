"""Deterministic global row indexing at scale.

The naive global index — ``row_number().over(Window.orderBy(...))``
with no PARTITION BY — collapses the whole relation into ONE partition
(Spark even warns); at 100 TB that's a single-executor sort. The
scalable idiom (TeraSort-style) implemented here:

1. range-repartition on the order keys (sampled range exchange — the
   same machinery as a distributed ORDER BY), sort within partitions,
   and persist() the result: range-boundary sampling is re-seeded per
   execution, so two independent runs of the exchange may place rows
   in different partitions — both downstream jobs must read ONE
   materialized partitioning;
2. count rows per partition (tiny N-row job over the persisted
   frame; this is also what materializes the cache);
3. prefix-sum those counts on the driver (N integers, not data) and
   ship the offsets back in the task closure;
4. one Arrow-batched pass assigns idx = partition_offset + local_pos
   via ``mapInPandas`` — partition-preserving, no further shuffle.

Total cost: ONE data shuffle + one metadata job, vs the single-
partition window's all-to-one collapse.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_global_index(
    df: DataFrame,
    order_cols: Sequence[str],
    index_col: str = "idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 0-based global index following the total order of
    `order_cols` — distributed, deterministic, dense (0..n-1).

    `order_cols` must form a TOTAL order (e.g. include a unique key):
    rows tying on all order columns would get arbitrary-but-dense
    index assignment within the tie. Ascending order only (wrap a
    column in a descending sort key expression upstream if needed).

    The range-partitioned intermediate is persisted (MEMORY_AND_DISK)
    so the count job and the index-assignment job see the SAME
    partitioning — without it, repartitionByRange's per-execution
    boundary sampling can shift rows between partitions between the
    two jobs, silently duplicating or skipping indices. The cache
    belongs to this frame's lineage; release it after consuming the
    result via ``spark.catalog.clearCache()`` or let session teardown
    reclaim it.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if index_col in df.columns:
        raise ValueError(f"column {index_col!r} already exists")
    n_parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    from pyspark import StorageLevel

    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # tiny metadata job: rows per physical partition. Runs over the
    # persisted frame, materializing it, so the assignment job below is
    # guaranteed the identical partitioning the offsets were computed on.
    counts = {
        r["__pid"]: r["count"]
        for r in ranged.groupBy(F.spark_partition_id().alias("__pid"))
        .count()
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in range(n_parts):
        offsets[pid] = acc
        acc += counts.get(pid, 0)

    # fresh StructType — .add would MUTATE the frame's cached schema
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(ranged.schema.fields) + [StructField(index_col, LongType(), False)]
    )

    def assign(batches):
        from pyspark import TaskContext

        pos = offsets[TaskContext.get().partitionId()]
        for pdf in batches:
            pdf[index_col] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield pdf

    return ranged.mapInPandas(assign, out_schema)


def z_value(cols, bits: int = 16):
    """Morton (Z-order) index: interleave the low `bits` bits of each
    integer column — the multi-dimensional clustering key behind
    Delta/Iceberg OPTIMIZE ZORDER. Sorting or range-partitioning by
    this value co-locates rows that are close in EVERY dimension, so
    min/max file statistics prune multi-predicate scans that a
    single-column sort cannot.

    Pure bit arithmetic (shift/and/or) — whole-stage-codegen'd, no
    UDF; `bits`·len(cols) must stay < 63. Callers clamp/normalize
    values into [0, 2^bits) first (out-of-range bits are simply
    dropped by the mask, which preserves ordering only within range).

    Usage for layout: df.repartitionByRange(n, z).sortWithinPartitions(z).
    """
    from functools import reduce

    from pyspark.sql import functions as F

    ncols = len(cols)
    assert bits * ncols < 63, "z_value overflows a signed 64-bit long"
    terms = []
    for j, c in enumerate(cols):
        x = (F.col(c) if isinstance(c, str) else c).cast("bigint")
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(x, i).bitwiseAND(F.lit(1)), i * ncols + j
                )
            )
    return reduce(lambda a, b: a + b, terms)
