"""Deterministic sampling operators for train/eval splits.

Two tiers, matching how much exactness costs at scale:

* proportional hash split (workload q46): a map-side Knuth
  multiplicative-hash filter — zero shuffles, reproducible across
  engines and runs, but per-stratum sizes are only *expected*
  frac·n. The 100 TB default.
* `stratified_sample_exact` (here): EXACTLY ceil(frac·n_s) rows per
  stratum, still deterministic, via distributed order-statistic
  selection — never a per-stratum global sort and never a window over
  a stratum partition (a handful of giant strata would serialize one).

Selection scheme (per stratum s, k_s = ceil(frac·n_s)):
  1. metadata pass: per-stratum counts (tiny agg; strata count is
     validated small);
  2. candidate pass: every task keeps its k_s smallest (hash, id)
     pairs per stratum — bounded state, Arrow-batched `mapInPandas` —
     and ships only those: shuffle volume ≤ tasks·Σk_s, independent
     of data size;
  3. the k_s-th smallest candidate overall is the stratum's exact
     selection threshold (any row below it beats k_s-1 others in its
     own task's candidates or was itself shipped — the standard
     distributed top-k argument);
  4. map-side filter of the base data against the broadcast
     per-stratum thresholds.

The sort key is (knuth_hash(id), id): the id tiebreak makes it a
total order even on hash collisions, so "exactly k_s" is exact, and
the same ORDER BY is expressible in ANSI SQL for the oracle.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Knuth's multiplicative constant; (id * A) mod 2^32 is a bijection of
#: [0, 2^32) for odd A, and plain BIGINT arithmetic in any SQL engine.
KNUTH_A = 2654435761
KNUTH_MOD = 4294967296


def knuth_hash(col: F.Column | str) -> F.Column:
    """Cross-engine deterministic spreading hash of an integer key.

    The multiply runs in DECIMAL(38,0): id * A overflows int64 for
    id >= ~3.5e9 (ANSI mode would throw, non-ANSI would silently wrap
    while a BIGINT oracle errors). Decimal keeps the arithmetic exact
    for the full bigint id range; an oracle handling ids that large
    must CAST to HUGEINT/DECIMAL the same way.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        c.cast("decimal(38,0)") * F.lit(KNUTH_A) % F.lit(KNUTH_MOD)
    ).cast("long")


def stratified_sample_exact(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    frac: float,
    max_strata: int = 10_000,
    max_k: int = 10_000_000,
) -> DataFrame:
    """Exactly ceil(frac * n_s) rows from every stratum, chosen as the
    smallest (knuth_hash(id), id) keys — deterministic, rerun-stable,
    and equal to the SQL `ROW_NUMBER() OVER (PARTITION BY stratum
    ORDER BY hash, id) <= CEIL(frac * n_s)` specification.

    Requires an integer `id_col`. `max_strata` bounds the metadata
    collect; `max_k` bounds per-task candidate state (a stratum
    needing more than max_k rows should use the proportional hash
    split instead — at that size the ±sqrt(k) binomial wobble is
    negligible anyway).
    """
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    if frac == 0.0:
        return df.limit(0)

    counts = df.groupBy(stratum_col).count().collect()
    if len(counts) > max_strata:
        raise ValueError(
            f"{len(counts)} strata exceeds max_strata={max_strata}; "
            "stratified selection assumes a modest stratum count"
        )
    k_by_stratum = {
        r[stratum_col]: math.ceil(frac * r["count"]) for r in counts
    }
    biggest = max(k_by_stratum.values())
    if biggest > max_k:
        raise ValueError(
            f"largest stratum needs k={biggest} > max_k={max_k}; use the "
            "proportional hash split (workload q46) at this size"
        )

    keyed = df.select(
        F.col(stratum_col), knuth_hash(id_col).alias("__h"), F.col(id_col)
    )
    cand_schema = T.StructType(
        [
            keyed.schema[stratum_col],
            T.StructField("__h", T.LongType()),
            keyed.schema[id_col],
        ]
    )

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        state: dict = {}  # stratum -> (h array, id array), each <= k_s
        for pdf in batches:
            # dropna=False: a NULL stratum is a real stratum (matches
            # Spark groupBy and the SQL PARTITION BY specification)
            for s, grp in pdf.groupby(stratum_col, sort=False, dropna=False):
                if pd.isna(s):
                    s = None
                k = k_by_stratum.get(s)
                if not k:
                    continue
                h = grp["__h"].to_numpy(dtype="int64")
                i = grp[id_col].to_numpy(dtype="int64")
                if s in state:
                    h = np.concatenate([state[s][0], h])
                    i = np.concatenate([state[s][1], i])
                if len(h) > k:
                    keep = np.lexsort((i, h))[:k]
                    h, i = h[keep], i[keep]
                state[s] = (h, i)
        for s, (h, i) in state.items():
            yield pd.DataFrame({stratum_col: s, "__h": h, id_col: i})

    candidates = keyed.mapInPandas(local_topk, cand_schema)

    k_df = df.sparkSession.createDataFrame(
        [(s, k) for s, k in k_by_stratum.items() if k > 0],
        T.StructType(
            [keyed.schema[stratum_col], T.StructField("__k", T.LongType())]
        ),
    )  # NOT coalesce(1): merging pickled partitions pays a Python-
    # worker round-trip per parent partition (see train_pq_codebooks)
    cand_agg = candidates.groupBy(stratum_col).agg(
        F.array_sort(F.collect_list(F.struct("__h", id_col))).alias("__cand")
    )
    # eqNullSafe joins throughout: a NULL stratum must keep matching
    thresholds = (
        cand_agg.join(
            k_df.withColumnRenamed(stratum_col, "__ks"),
            cand_agg[stratum_col].eqNullSafe(F.col("__ks")),
        )
        .select(
            stratum_col,
            F.element_at(
                "__cand", F.least(F.col("__k"), F.size("__cand")).cast("int")
            ).alias("__thr"),
        )
    )

    row_key = F.struct(knuth_hash(id_col).alias("__h"), F.col(id_col).alias(id_col))
    thr = thresholds.withColumnRenamed(stratum_col, "__ts")
    return (
        df.join(F.broadcast(thr), F.col(stratum_col).eqNullSafe(F.col("__ts")))
        .where(row_key <= F.col("__thr"))
        .drop("__thr", "__ts")
    )


def source_mix(
    df,
    source_col: str,
    weight_col: str,
    id_col: str,
):
    """Deterministic data-mixture rebalancing: subsample each source so
    retained counts are proportional to `weight_col` (a per-row weight
    constant within a source), at the largest feasible total corpus
    without oversampling any source.

    rate_s = weight_s · unit / count_s, where
    unit = min_s(count_s / weight_s) — so rate ≤ 1 everywhere and the
    most-constrained source is kept whole. Row selection is the Knuth
    multiplicative hash on `id_col`: reproducible across engines and
    runs, stable under repartitioning (no `rand()`).

    Scale shape: one count aggregation (|sources| rows), a broadcast
    1-row min, a broadcast rates join, and a map-side filter — the
    fact table is scanned once and never shuffled.
    """
    # exactly ONE (count, weight) row per source: weight is meant to be
    # constant within a source, but aggregating with max() guarantees a
    # single rate row even on contract-violating input — a per-(source,
    # weight) grouping would emit several rate rows and the rates join
    # below would then DUPLICATE fact rows (found by hypothesis)
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.max(weight_col).alias("__w"),
    )
    unit = counts.agg(
        F.min(F.col("__cnt") / F.col("__w")).alias("__unit")
    )
    rates = counts.crossJoin(F.broadcast(unit)).select(
        source_col,
        (F.col("__w") * F.col("__unit") / F.col("__cnt")).alias("__rate"),
    )
    u = knuth_hash(id_col) / F.lit(float(KNUTH_MOD))
    return df.join(F.broadcast(rates), source_col).where(u < F.col("__rate"))


def budget_waterfill(
    df: DataFrame,
    key_col: str,
    weight_col,
    budget_frac: float,
) -> DataFrame:
    """Token-budget mixture planner: given per-row weights (token
    counts) grouped by `key_col` (source), allocate a total budget of
    `budget_frac · Σweights` across sources by WATERFILLING — every
    source keeps min(its total, L) where the level L is chosen so the
    allocations exactly exhaust the budget. Sources below the level
    keep everything; big sources are capped equally — the standard
    "cap the head, keep the tail" pretraining-mixture rule.

    Closed form, no iteration: sort source totals ascending, find the
    largest prefix j whose totals stay under the level
    (cum_j + (n−j)·t_j ≤ budget), then L = (budget − cum_j)/(n − j).
    The only window runs over the SOURCE-GRAIN relation (one row per
    source) — never the corpus; corpus-sized work is one hash agg.

    Returns DataFrame[key, total, allocated, rate] with allocated and
    rate rounded to 4 decimals.
    """
    from pyspark.sql import Window

    w_c = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    tot = df.groupBy(key_col).agg(F.sum(w_c).cast("long").alias("total"))
    ordw = Window.orderBy("total", key_col)
    scalars = tot.agg(
        F.sum("total").alias("_s"), F.count(F.lit(1)).alias("_n")
    ).select(
        (F.lit(budget_frac) * F.col("_s")).alias("_budget"), "_n"
    )
    w = (
        tot.join(F.broadcast(scalars))
        .withColumn(
            "_cum",
            F.sum("total").over(
                ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("_rn", F.row_number().over(ordw))
    )
    elig = w.where(
        F.col("_cum") + (F.col("_n") - F.col("_rn")) * F.col("total")
        <= F.col("_budget")
    )
    jrow = elig.agg(
        F.coalesce(F.max("_rn"), F.lit(0)).alias("_j"),
        F.coalesce(F.max("_cum"), F.lit(0)).alias("_cumj"),
    )
    lvl = (
        scalars.join(F.broadcast(jrow))
        .join(F.broadcast(tot.agg(F.max("total").alias("_tmax"))))
        .select(
            F.when(F.col("_n") == F.col("_j"), F.col("_tmax").cast("double"))
            .otherwise(
                (F.col("_budget") - F.col("_cumj"))
                / (F.col("_n") - F.col("_j"))
            )
            .alias("_L")
        )
    )
    alloc = F.least(F.col("total").cast("double"), F.col("_L"))
    return (
        tot.join(F.broadcast(lvl))
        .select(
            key_col,
            "total",
            F.round(alloc, 4).alias("allocated"),
            F.round(alloc / F.col("total"), 4).alias("rate"),
        )
    )


# --- Deterministic seeded shuffle / shard assignment -----------------------
#
# Training-data writes need a GLOBAL random permutation (break source
# ordering so any contiguous read slice is i.i.d.-ish) that is
# deterministic: re-running the job — or re-deriving one lost shard —
# must reproduce byte-identical output. A `rand()`-sort gives neither
# (per-task RNG state depends on partitioning). Keying the order on a
# seeded hash of a stable id gives both, and the same arithmetic runs
# in any SQL engine (workload q151 hash-checks the full permutation
# via an order-sensitive checksum).

_SHUFFLE_A = 1103515245  # multiply-mod-prime scramble (same family as
_SHUFFLE_B = 12345       # the KMV estimator's; see sketch.py)


def shuffle_hash(key: Column | str, seed: int) -> Column:
    """Position key in [0, 2^31-1): scrambled rolling hash of
    '<seed>:<key>'. Pure cross-engine integer arithmetic."""
    from redskins_rule_spark.functions.hashing import MERSENNE_31, rolling_hash

    c = F.col(key) if isinstance(key, str) else key
    roll = rolling_hash(F.concat(F.lit(f"{seed}:"), c.cast("string")))
    return (F.lit(_SHUFFLE_A) * roll + F.lit(_SHUFFLE_B)) % F.lit(MERSENNE_31)


def seeded_shuffle(
    df: DataFrame,
    key_col: str,
    seed: int = 0,
    n_shards: int = 16,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic pseudo-random permutation + shard assignment.

    Adds `shard` (= h mod n_shards) and `pos` (1-based rank of
    (h, key) within the shard): writing shard files ordered by pos
    yields an identically-reproducible global shuffle of the corpus.
    The key tiebreak makes the order total even on hash collisions.

    Scale shape: one shuffle into n_shards rank partitions. The
    per-shard window bounds parallelism at n_shards — pick n_shards
    well above the executor count (a 100 TB corpus wants thousands of
    shard files anyway, so the constraint is the natural layout).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = shuffle_hash(key_col, seed)
    out = df.withColumn("__h", h).withColumn(
        shard_col, F.pmod(F.col("__h"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy(shard_col).orderBy("__h", key_col)
    return out.withColumn(pos_col, F.row_number().over(w)).drop("__h")


def negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 3,
    seed: int = 0,
    stride: int = 2654435761,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    each anchor row, `k` pseudo-random partner rows drawn from the
    whole corpus — reproducible across reruns and partitionings, and
    expressible in plain SQL for differential checking (q152).

    Mechanics: rows get a dense global index (prefix-sum, no global
    window); each anchor probes indices (h + j·stride) mod n for
    j = 1..k off its seeded shuffle hash, bumping a self-hit to the
    next index. Partner lookup is one equi join on the index. Probes
    are i.i.d.-ish across anchors; a single anchor's k probes may
    collide with each other on tiny corpora (callers needing
    distinct-per-anchor negatives raise k and dedup).

    Returns (anchor_id, j, neg_id), k rows per anchor. One index
    pass + one shuffle join — no per-row Python, no collect of data.

    Cache note: the global index persists its range-partitioned frame
    (with_global_index's determinism contract) and that cache must
    outlive THIS function's laziness — release it after materializing
    the result (`spark.catalog.clearCache()` or session teardown),
    same duty with_global_index documents.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from redskins_rule_spark.operators.indexing import with_global_index

    ids = with_global_index(df.select(id_col), [id_col], "idx")
    n = ids.count()  # scalar metadata job; reuses the persisted range partitioning
    if n < 2:
        raise ValueError(f"need >= 2 rows to sample negatives, got {n}")
    h = shuffle_hash(id_col, seed)
    anchors = ids.select(
        F.col(id_col).alias("anchor_id"), "idx", h.alias("__h")
    ).select(
        "anchor_id", "idx", "__h",
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"),
    )
    raw = (F.col("__h") + F.col("j").cast("long") * F.lit(stride)) % F.lit(n)
    neg = F.when(raw == F.col("idx"), (raw + 1) % F.lit(n)).otherwise(raw)
    lookup = ids.select(
        F.col("idx").alias("neg_idx"), F.col(id_col).alias("neg_id")
    )
    return (
        anchors.withColumn("neg_idx", neg.cast("long"))
        .join(lookup, "neg_idx")
        .select("anchor_id", "j", "neg_id")
    )


def write_shuffled_shards(
    df: DataFrame,
    key_col: str,
    out_dir: str,
    seed: int = 0,
    n_shards: int = 16,
) -> None:
    """Materialize a seeded global shuffle as shard-partitioned
    parquet: `out_dir/shard=N/` holds shard N's rows in permutation
    order (each shard's rows are hash-routed to ONE task, so the
    sortWithinPartitions order is the file order). Training readers
    stream shards sequentially and get the reproducible global
    shuffle; re-running the writer reproduces every shard
    byte-identically, so one lost shard re-derives without touching
    the rest."""
    shuffled = seeded_shuffle(df, key_col, seed=seed, n_shards=n_shards)
    (
        shuffled.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def stratified_negative_samples(
    df: DataFrame,
    id_col: str,
    stratify_col: str,
    k: int = 3,
    seed: int = 0,
    stride: int = 2654435761,
) -> DataFrame:
    """Negative sampling WITHIN strata — contrastive partners drawn
    from the anchor's own language/source/domain (in-domain negatives
    are the hard ones; cross-domain pairs are trivially separable).

    Windowless per-stratum ranking: ONE global dense index ordered by
    (stratum, id), then rank-in-stratum = global_idx − the stratum's
    min index (a stratum-grain agg broadcast back) — no per-stratum
    window sort funneling a giant stratum through one task. Probes
    run in rank space mod the stratum size with the same seeded-hash
    arithmetic as `negative_samples` (self-hit bumps to the next
    rank); partner lookup is one equi join on the global index.

    Strata of size 1 yield no rows for their anchor (no valid
    in-stratum negative exists); everything else gets exactly k.
    Same cache-duty note as negative_samples (the index persists).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from redskins_rule_spark.operators.indexing import with_global_index

    ids = with_global_index(
        df.select(stratify_col, id_col), [stratify_col, id_col], "idx"
    )
    bounds = ids.groupBy(stratify_col).agg(
        F.min("idx").alias("__lo"), F.count(F.lit(1)).alias("__n")
    )
    ranked = ids.join(F.broadcast(bounds), stratify_col).select(
        stratify_col,
        F.col(id_col).alias("anchor_id"),
        "idx", "__lo", "__n",
        (F.col("idx") - F.col("__lo")).alias("__r"),
    )
    h = shuffle_hash("anchor_id", seed)
    anchors = ranked.where(F.col("__n") >= 2).select(
        stratify_col, "anchor_id", "__lo", "__n", "__r", h.alias("__h"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"),
    )
    raw = (F.col("__h") + F.col("j").cast("long") * F.lit(stride)) % F.col("__n")
    neg_r = F.when(raw == F.col("__r"), (raw + 1) % F.col("__n")).otherwise(raw)
    lookup = ids.select(
        F.col("idx").alias("__nidx"), F.col(id_col).alias("neg_id")
    )
    return (
        anchors.withColumn("__nidx", (F.col("__lo") + neg_r).cast("long"))
        .join(lookup, "__nidx")
        .select(stratify_col, "anchor_id", "j", "neg_id")
    )
