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
   ship the offsets back as one parsed map literal;
4. idx = offsets[spark_partition_id()] + intra-partition position
   (read off ``monotonically_increasing_id()``'s documented
   ``(pid << 33) + local_pos`` layout) — pure JVM column math,
   partition-preserving, no further shuffle, and no Arrow/Python
   boundary pass over the data (r13; previously a ``mapInPandas``
   pass shipped every row through Python to add one long).

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

    # Index assignment is pure JVM column math (r13, guide §4: the
    # previous mapInPandas pass shipped EVERY row through the
    # Arrow/Python boundary just to add one long). Spark's
    # monotonically_increasing_id() is, by its documented contract,
    # (partition_id << 33) + intra-partition row position — so the
    # local position is mid - (pid << 33), and the global index is
    # offsets[pid] + local position. Both expressions read the SAME
    # persisted partitioning the offsets were computed on, so the
    # assignment is identical to the Python pass; the offsets ship as
    # one parsed map literal (n_parts entries of metadata, the same
    # payload the task closure used to carry). Partition-preserving,
    # no shuffle, whole-stage-codegen'd.
    local_pos = F.monotonically_increasing_id() - F.shiftleft(
        F.spark_partition_id().cast("long"), 33
    )
    offsets_map = F.expr(
        "map("
        + ",".join(f"{pid}, {offsets[pid]}L" for pid in range(n_parts))
        + ")"
    )
    return ranged.withColumn(
        index_col,
        (F.element_at(offsets_map, F.spark_partition_id()) + local_pos).cast(
            "long"
        ),
    )


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


# --- deterministic corpus shuffle (epoch-reproducible global permutation) --

# Feistel round constants: public splitmix64/murmur3/xxhash mixing
# primes (0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F, 0x165667B1) paired with
# fixed round offsets; seed/epoch enter every round through the
# Knuth multiplicative constant 2654435761 and 40503. Nothing here is
# data-dependent — both engines replay the identical closed form.
FEISTEL_ROUNDS: tuple[tuple[int, int], ...] = (
    (0x85EBCA6B, 604171),
    (0xC2B2AE35, 1208342),
    (0x27D4EB2F, 1812513),
    (0x165667B1, 2416684),
)
_FEISTEL_S1 = 2654435761  # seed multiplier (Knuth)
_FEISTEL_S2 = 40503       # epoch multiplier


def feistel_key_column(idx, *, seed: int, epoch: int, bits: int = 40):
    """Closed-form bijective permutation of [0, 2^bits) as a Spark
    Column — the shuffle key behind `corpus_shuffle`.

    A balanced Feistel network (4 rounds, xor-folded multiply round
    function) over the dense global row index: every epoch/seed pair
    yields a DIFFERENT uniform-quality permutation, every engine that
    replays the integer algebra gets the SAME one (the differential
    oracle replays it via `feistel_key_sql`). Pure +/*/>>/xor/& on
    BIGINT — whole-stage-codegen'd, no UDF, no data pass.

    Overflow safety: `bits` must be even and <= 40 (half-words <=
    2^20; the round multiply then peaks below 2^52) and seed/epoch
    must sit in [0, 2^20) so the additive term stays below 2^52.
    bits=40 covers ~1.1e12 rows — a 100 TB corpus of 100-byte rows.

    Domain guard (ADVICE r12): an index outside [0, 2^bits) would
    silently break the bijection (duplicate shuffle keys → arbitrary
    tie-broken epoch_pos diverging from the oracle), so out-of-domain
    rows raise BY NAME at execution time via a conditional
    `raise_error` branch — one codegen'd comparison per row, no extra
    pass. `feistel_key_sql` documents (rather than guards) the same
    domain: the oracle replays the engine's already-validated keys.
    """
    from pyspark.sql import functions as F

    _feistel_check(seed, epoch, bits)
    half = bits // 2
    mask = (1 << half) - 1
    x = (F.col(idx) if isinstance(idx, str) else idx).cast("bigint")
    x = F.when(
        (x < 0) | (x >= F.lit(1 << bits)),
        F.raise_error(
            F.concat(
                F.lit(f"feistel index out of domain [0, 2^{bits}): "),
                x.cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(x)
    L = F.shiftright(x, half)
    R = x.bitwiseAND(F.lit(mask))
    for m, c in FEISTEL_ROUNDS:
        t = R * F.lit(m) + F.lit(seed * _FEISTEL_S1 + epoch * _FEISTEL_S2 + c)
        f = F.shiftright(t, half).bitwiseXOR(t).bitwiseAND(F.lit(mask))
        L, R = R, L.bitwiseXOR(f)
    return F.shiftleft(L, half) + R


def feistel_key_sql(expr: str, *, seed: int, epoch: int, bits: int = 40) -> str:
    """The identical permutation as an ANSI/DuckDB SQL expression over
    `expr` (a BIGINT column or expression) — used by differential
    oracles so the engine and the oracle derive the shuffle key from
    the same constants (this module is the single source of truth).

    Domain: `expr` must land in [0, 2^bits). The Spark side
    (`feistel_key_column`) raises by name on out-of-domain rows; the
    oracle replays keys the engine already validated, so no SQL-side
    guard is added (it would perturb the differential's plan, not its
    results)."""
    _feistel_check(seed, epoch, bits)
    half = bits // 2
    mask = (1 << half) - 1
    L = f"(({expr}) >> {half})"
    R = f"(({expr}) & {mask})"
    for m, c in FEISTEL_ROUNDS:
        t = f"({R} * {m} + {seed * _FEISTEL_S1 + epoch * _FEISTEL_S2 + c})"
        f = f"(xor(({t} >> {half}), {t}) & {mask})"
        L, R = R, f"xor({L}, {f})"
    return f"(({L} << {half}) + {R})"


def _feistel_check(seed: int, epoch: int, bits: int) -> None:
    if bits % 2 or not 2 <= bits <= 40:
        raise ValueError("feistel bits must be even and in [2, 40]")
    if not 0 <= seed < (1 << 20) or not 0 <= epoch < (1 << 20):
        raise ValueError("feistel seed/epoch must be in [0, 2^20)")


def corpus_shuffle(
    df: DataFrame,
    idx_col: str,
    *,
    seed: int = 0,
    epoch: int = 0,
    key_col: str = "shuffle_key",
    pos_col: str = "epoch_pos",
    bits: int = 40,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic epoch-reproducible corpus shuffle — the one
    data-ordering operator every pretraining pipeline runs per epoch.

    `idx_col` is a dense nonnegative global row index (< 2^bits; pair
    with `with_global_index` if the data lacks one). The operator adds

      * `key_col`: the Feistel-permuted index — closed-form integer
        math, so the SAME (seed, epoch) reproduces the SAME global
        permutation across runs, engines, and cluster sizes, and a
        different epoch yields an independent-looking order with no
        state carried between epochs;
      * `pos_col`: the dense 0-based position of the row in the
        shuffled order (key rank — ranks are dense because the
        permutation is a bijection, so key order == shuffle order).

    and returns rows physically range-partitioned + sorted by
    `key_col`. Cost model at 100 TB: the key is whole-stage-codegen'd
    column math (no data pass of its own) and the reorder is ONE
    range exchange plus a metadata-count prefix sum (the
    `with_global_index` machinery) — never a single-partition window,
    never a driver-side sort. Reshuffling for the next epoch is the
    same single exchange with a new closed-form key.
    """
    if key_col in df.columns or pos_col in df.columns:
        raise ValueError("key/pos column already exists")
    keyed = df.withColumn(
        key_col,
        feistel_key_column(idx_col, seed=seed, epoch=epoch, bits=bits),
    )
    return with_global_index(
        keyed, [key_col], index_col=pos_col, num_partitions=num_partitions
    )
