"""Cardinality sketches — distinct-count estimation beyond the
built-in HLL (`approx_count_distinct`, workload q43).

KMV (k-minimum-values): keep the k smallest distinct hash values of a
column; with U(k) = h_k / M (the k-th minimum as a fraction of the
hash space), D̂ = (k-1) / U(k). Unlike Spark's HLL sketch — whose
register layout is engine-specific and therefore only rows-checkable
in a differential harness — KMV over the cross-engine rolling hash
(`functions.hashing.rolling_hash`, pure integer arithmetic) produces
the IDENTICAL estimate in any SQL engine, so the whole sketch is
value-hash-testable (workload q43b).

Scale shape (100 TB): one shuffle for the (group, hash) distinct
(map-side combine), then a LOCAL per-partition top-k (bounded memory:
k rows per group per partition, no sort of the full distinct set)
before the final per-group merge, whose input is ≤ partitions·k rows
per group. The window-sort alternative (row_number over all distinct
hashes) would sort the entire distinct set per group; the local
combine keeps the big sort out of the plan entirely.
"""

from __future__ import annotations

import math

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from redskins_rule_spark.functions.hashing import MERSENNE_31, rolling_hash

# multiply-mod-prime universal-hash scramble. The raw rolling hash of
# SHORT strings occupies only the low end of [0, M) (a 4-char string
# rolls to < 257³·128), which wrecks the KMV estimator — it reads
# h_k/M as a uniform fraction. (a·h + b) mod p scatters distinct
# values ~uniformly; a·h < 2^61 stays overflow-safe in BIGINT.
_SCRAMBLE_A = 1103515245
_SCRAMBLE_B = 12345


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    hash_expr: Column | None = None,
    modulus: int = MERSENNE_31,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-group KMV distinct-count estimate of `value_col`.

    hash_expr : hash of one value row → [0, modulus). Defaults to the
                cross-engine rolling hash of CAST(value AS STRING).
    Returns one row per group: group_cols + `out_col` (bigint).
    Exact when a group has < k distinct hashes (the sketch IS the
    distinct set); otherwise floor((k-1)·M / h_k) — computed in double
    then floored, bit-identical across engines.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = list(group_cols)
    if hash_expr is not None:
        h = hash_expr
    else:
        roll = rolling_hash(F.col(value_col).cast("string"), modulus=modulus)
        h = (F.lit(_SCRAMBLE_A) * roll + F.lit(_SCRAMBLE_B)) % modulus
    # NULL values are excluded, matching COUNT(DISTINCT)'s NULL
    # semantics (a NULL hash would otherwise float through pandas sorts
    # and collect_list inconsistently)
    distinct = (
        df.select(*groups, h.alias("__h"))
        .where(F.col("__h").isNotNull())
        .distinct()
    )

    # local combine: k smallest hashes per group per partition.
    # Accumulate the whole partition (batch iterator) before emitting —
    # output is bounded at k rows per group, independent of input size.
    fields = [distinct.schema[g] for g in groups]
    out_schema = T.StructType([*fields, T.StructField("__h", T.LongType())])

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            both = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            acc = (
                both.sort_values("__h", kind="mergesort")
                .groupby(groups, sort=False, dropna=False)  # NULL is a real group
                .head(k)
            )
        if acc is not None and len(acc):
            yield acc

    local = distinct.mapInPandas(local_topk, out_schema)

    # global merge: ≤ partitions·k rows per group reach this aggregate
    mins = F.slice(F.sort_array(F.collect_list("__h")), 1, k)
    agg = local.groupBy(*groups).agg(mins.alias("__mins"))
    n = F.size("__mins")
    hk = F.element_at("__mins", k).cast("double")
    est = F.when(n < k, n.cast("long")).otherwise(
        F.floor(F.lit(float(k - 1)) * F.lit(float(modulus)) / hk).cast("long")
    )
    return agg.select(*groups, est.alias(out_col))


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    threshold_frac: float,
    k: int | None = None,
    total: int | None = None,
    count_col: str = "item_count",
) -> DataFrame:
    """EXACT frequent items at scale: every `item_col` value occurring
    in ≥ `threshold_frac` of rows, with its exact count — without ever
    shuffling the full key space.

    The naive plan (groupBy(item).count().filter) shuffles one row per
    DISTINCT key; at 100 TB with, say, 10^10 distinct tokens that
    shuffle dwarfs the answer (a handful of rows). Classic two-pass
    scheme instead:

      pass 1 — per-partition Misra–Gries summaries (`mapInPandas`,
        state bounded at k entries regardless of partition size).
        Guarantee: MG(k) error on a partition of n_p rows is
        ≤ n_p/(k+1), so any item with partition count > n_p/(k+1)
        survives; a globally-heavy item (count ≥ θ·n = Σθ·n_p) must by
        pigeonhole exceed θ·n_p ≥ n_p/(k+1) in some partition
        (requires k+1 > 1/θ, validated). Candidates ≤ k·partitions.
      pass 2 — exact recount of candidates only: broadcast-semi-join
        the scan against the tiny candidate set, then an ordinary hash
        agg whose key space is ≤ k·partitions.

    The result is EXACT (pass 2 counts, pass 1 only prunes), hence
    oracle-checkable with GROUP BY/HAVING (workload q57).

    total : count of NON-NULL item rows if the caller already knows
            it (skips one metadata-sized count job) — the threshold is
            relative to non-null rows. NULL items are EXCLUDED by
            contract (filtered before both passes): NaN keys don't
            survive pandas value_counts / equi semi-joins coherently,
            so silent partial handling would be worse than none.
    """
    if not 0 < threshold_frac < 1:
        raise ValueError(f"threshold_frac must be in (0, 1), got {threshold_frac}")
    if k is None:
        k = int(2.0 / threshold_frac) + 1
    if k + 1 <= 1.0 / threshold_frac:
        raise ValueError(
            f"k={k} too small for threshold {threshold_frac}: need k+1 > 1/θ "
            f"= {1.0 / threshold_frac:.1f} for the survival guarantee"
        )

    df = df.where(F.col(item_col).isNotNull())
    items = df.select(item_col)
    field = items.schema[item_col]
    cand_schema = T.StructType([field])

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # merge the batch's exact counts into the MG summary, then
            # restore |summary| ≤ k by subtracting the (k+1)-th largest
            # weight from all (the mergeable-summaries combine rule)
            for item, c in pdf[item_col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {i: c - cut for i, c in counters.items() if c > cut}
        if counters:
            yield pd.DataFrame({item_col: list(counters.keys())})

    candidates = items.mapInPandas(mg_partition, cand_schema).distinct()

    n_rows = total if total is not None else df.count()
    # ceil, NOT floor: the Misra-Gries survival guarantee only covers
    # items with count >= theta*n, so a floor threshold would admit items
    # (count in [floor(theta*n), theta*n)) that pass 1 may have pruned --
    # partition-dependent output. The oracle must use CEIL identically.
    min_count = math.ceil(n_rows * threshold_frac)
    return (
        df.join(F.broadcast(candidates), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias(count_col))
        .where(F.col(count_col) >= F.lit(min_count))
    )


# --- mergeable KMV states ---------------------------------------------------
#
# The persistable face of kmv_distinct: the sketch (the k smallest
# value hashes) is itself a column you can store per partition/day/
# source and MERGE later — distributed incremental analytics without
# re-reading history. Merging is lossless: the merged sketch equals
# the sketch of the concatenated data (min-k is a semilattice), so
# per-shard states + one merge == one global pass. Set-operation
# estimates (union/intersection/Jaccard) come straight off two states
# row-locally — the theta-sketch trick with the KMV estimator.


def kmv_state(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    modulus: int = MERSENNE_31,
    out_col: str = "kmv",
) -> DataFrame:
    """Per-group KMV state: sorted array of the k smallest distinct
    value hashes (the same pipeline as kmv_distinct, exposing the
    sketch instead of the estimate). Store it; merge it later."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = list(group_cols)
    roll = rolling_hash(F.col(value_col).cast("string"), modulus=modulus)
    h = (F.lit(_SCRAMBLE_A) * roll + F.lit(_SCRAMBLE_B)) % modulus
    distinct = (
        df.select(*groups, h.alias("__h"))
        .where(F.col("__h").isNotNull())
        .distinct()
    )
    mins = F.slice(F.sort_array(F.collect_list("__h")), 1, k)
    return distinct.groupBy(*groups).agg(mins.alias(out_col))


def kmv_merge(a: Column, b: Column, k: int) -> Column:
    """Row-local merge of two KMV states (k smallest of the union —
    associative, commutative, idempotent)."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def kmv_estimate(state: Column, k: int, modulus: int = MERSENNE_31) -> Column:
    """Distinct-count estimate from a state array (exact below k)."""
    n = F.size(state)
    hk = F.element_at(state, k).cast("double")
    return F.when(n < k, n.cast("long")).otherwise(
        F.floor(F.lit(float(k - 1)) * F.lit(float(modulus)) / hk).cast("long")
    )


def kmv_set_estimates(
    a: Column, b: Column, k: int, modulus: int = MERSENNE_31
) -> dict[str, Column]:
    """Union / intersection / Jaccard estimates from TWO states,
    entirely row-local: the merged sketch estimates the union; the
    fraction of merged entries present in BOTH input sketches
    estimates Jaccard; intersection = Jaccard × union."""
    merged = kmv_merge(a, b, k)
    union_est = kmv_estimate(merged, k, modulus)
    in_both = F.size(
        F.filter(
            merged,
            lambda x: F.array_contains(a, x) & F.array_contains(b, x),
        )
    )
    jacc = in_both / F.greatest(F.size(merged), F.lit(1))
    return {
        "union_est": union_est,
        "jaccard_est": F.round(jacc, 4),
        "intersection_est": F.round(jacc * union_est, 1).cast("double"),
    }


# --- count-min sketch -------------------------------------------------------
#
# The frequency-side companion of the KMV state: a depth×width counter
# grid per group, mergeable by ELEMENT-WISE ADDITION (exactly the
# linearity that lets per-shard sketches sum into the global one), with
# one-sided error — estimates never undercount, overcount ≤ εN with
# probability 1−δ for width=⌈e/ε⌉, depth=⌈ln(1/δ)⌉. Use for hot-key
# detection / frequency caps over keyspaces too large to count exactly.


def cm_state(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    width: int = 256,
    depth: int = 4,
    out_col: str = "cm",
) -> DataFrame:
    """Per-group count-min state: flat array<long> of depth·width
    counters (row d occupies [d·width, (d+1)·width)). Hash family is
    seeded xxhash64 — JVM-side, no Python in the row path."""
    groups = list(group_cols)
    v = F.col(value_col).cast("string")
    cells = F.array(*[
        F.struct(
            (F.lit(d * width) + F.pmod(F.xxhash64(F.lit(d), v), F.lit(width)))
            .cast("int").alias("pos")
        )
        for d in range(depth)
    ])
    exploded = df.select(*groups, F.explode(cells).alias("c")).select(
        *groups, F.col("c.pos").alias("pos")
    )
    counts = exploded.groupBy(*groups, "pos").agg(
        F.count(F.lit(1)).alias("n")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(depth * width - 1)),
        lambda i: F.coalesce(
            F.element_at(F.map_from_entries(F.collect_list(F.struct("pos", "n"))), i.cast("int")),
            F.lit(0).cast("long"),
        ),
    )
    return counts.groupBy(*groups).agg(dense.alias(out_col))


def cm_merge(a: Column, b: Column) -> Column:
    """Element-wise sum of two count-min states (linear sketch)."""
    return F.zip_with(a, b, lambda x, y: x + y)


def cm_estimate(
    state: Column, value, width: int = 256, depth: int = 4
) -> Column:
    """Frequency estimate of `value` from a state: min over rows of
    the value's counter — never undercounts."""
    v = (value if isinstance(value, Column) else F.lit(value)).cast("string")
    return F.least(*[
        F.element_at(
            state,
            (F.lit(d * width) + F.pmod(F.xxhash64(F.lit(d), v), F.lit(width))
             ).cast("int") + 1,
        )
        for d in range(depth)
    ])


# --- DDSketch (relative-error quantiles) ------------------------------------
#
# The quantile-side member of the mergeable-state family (KMV =
# cardinality, count-min = frequency, DD = quantiles). Masson,
# Rim & Lee, "DDSketch: a fast and fully-mergeable quantile sketch
# with relative-error guarantees" (VLDB 2019): bucket positive values
# by ceil(log_gamma(x)) with gamma = (1+alpha)/(1-alpha); any value in
# bucket i is within relative error alpha of the bucket's midpoint
# estimate 2*gamma^i/(gamma+1). The state is a bucket->count map:
# merging two sketches is a per-key counter sum (map_zip_with), and
# merge(state(A), state(B)) == state(A ∪ B) EXACTLY — per-shard/day
# states roll up into the global sketch losslessly, unlike sampled
# quantile summaries.
#
# Every step is deterministic integer/bucket arithmetic on expressions
# both engines share, so unlike approx_percentile (engine-specific
# internals, rows-only checkable) the whole sketch — state AND the
# quantile read off it — is value-hash-testable cross-engine
# (workload q148).
#
# Scale shape (100 TB): one hash agg to (group, bucket) counts with
# map-side combine, then one per-group map assembly; state size is
# O(log(max/min)/alpha) buckets — ~900 buckets per group at alpha=0.01
# over a 1e9 dynamic range — never data-sized. Quantile reads are
# row-local folds over the map, no re-scan of the data.


def _dd_gamma(alpha: float) -> float:
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    # spelled exactly like the oracle SQL so both engines build the
    # identical IEEE double before taking the log
    return (1.0 + alpha) / (1.0 - alpha)


def dd_bucket(value: Column, alpha: float = 0.01) -> Column:
    """Bucket index ceil(ln(x)/ln(gamma)) of a POSITIVE value."""
    return F.ceil(F.log(value.cast("double")) / F.log(F.lit(_dd_gamma(alpha)))).cast("int")


def dd_state(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.01,
    out_col: str = "dd",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group DDSketch state: map<bucket int, count long>.

    Contract: strictly positive values only (the log-bucketing
    domain); rows with value <= 0 or NULL are excluded, matching the
    paper's positive-store. Callers with signed data split sign /
    shift before sketching.

    weight_col: optional non-negative INTEGER weights — each row
    counts weight times (e.g. token counts, giving length-biased
    "the median token sits in a doc of size X" quantiles). Integer
    weights keep the state exact, hence mergeable-lossless and
    cross-engine hashable.
    """
    groups = list(group_cols)
    v = F.col(value_col).cast("double")
    w = (
        F.count(F.lit(1))
        if weight_col is None
        else F.sum(F.col(weight_col).cast("long"))
    )
    buckets = (
        df.where(v.isNotNull() & (v > 0))
        .groupBy(*groups, dd_bucket(v, alpha).alias("__b"))
        .agg(w.alias("__n"))
    )
    state = F.map_from_entries(F.array_sort(F.collect_list(F.struct("__b", "__n"))))
    return buckets.groupBy(*groups).agg(state.alias(out_col))


def dd_merge(a: Column, b: Column) -> Column:
    """Per-bucket counter sum of two DD states (linear sketch —
    merged state == state of the concatenated data, exactly)."""
    return F.map_zip_with(
        a, b,
        lambda _, x, y: F.coalesce(x, F.lit(0).cast("long"))
        + F.coalesce(y, F.lit(0).cast("long")),
    )


def dd_total(state: Column) -> Column:
    """Number of sketched values in a state (sum of bucket counts)."""
    return F.aggregate(
        F.map_values(state), F.lit(0).cast("long"), lambda acc, n: acc + n
    )


def dd_quantile(state: Column, q: float, alpha: float = 0.01) -> Column:
    """Quantile estimate read row-locally off a state.

    Walks buckets in ascending order to the one holding the value of
    rank 1 + floor(q*(n-1)) (nearest-rank on the sorted data) and
    returns that bucket's midpoint estimate 2*gamma^b/(gamma+1) —
    within relative error `alpha` of the true rank element. One
    fold over the O(#buckets) map; no data re-scan.
    """
    if not (0.0 <= q <= 1.0):
        raise ValueError(f"q must be in [0, 1], got {q}")
    g = _dd_gamma(alpha)
    entries = F.array_sort(F.map_entries(state))
    n = dd_total(state)
    rank = F.lit(1).cast("long") + F.floor(F.lit(q) * (n - 1).cast("double")).cast("long")
    nothing = F.lit(None).cast("int")
    init = F.struct(
        F.lit(0).cast("long").alias("cum"), nothing.alias("b")
    )
    found = F.aggregate(
        entries,
        init,
        lambda acc, e: F.when(acc["b"].isNotNull(), acc).otherwise(
            F.struct(
                (acc["cum"] + e["value"]).alias("cum"),
                F.when(acc["cum"] + e["value"] >= rank, e["key"])
                .otherwise(nothing)
                .alias("b"),
            )
        ),
    )
    return F.lit(2.0) * F.pow(F.lit(g), found["b"].cast("double")) / F.lit(g + 1.0)


def cm_inner_product(a: Column, b: Column, width: int = 256, depth: int = 4) -> Column:
    """Equi-join cardinality estimate from two count-min states:
    |A ⋈ B| on the sketched key = Σ_k f_A(k)·f_B(k), estimated as the
    MIN over depth rows of the row-wise dot product Σ_w a[w]·b[w]
    (AMS/CM inner product). One-sided — never underestimates — with
    overcount ≤ N_A·N_B/width per row whp. Plan shuffles and pick
    join strategies for keys too hot to count exactly, straight off
    two stored states, row-locally."""

    def row_dot(d: int) -> Column:
        return F.aggregate(
            F.zip_with(
                F.slice(a, d * width + 1, width),
                F.slice(b, d * width + 1, width),
                lambda x, y: x * y,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    return F.least(*[row_dot(d) for d in range(depth)])


def dd_ks(a: Column, b: Column) -> Column:
    """Two-sample Kolmogorov–Smirnov distance read off two DD states:
    max over the merged bucket grid of |F_a − F_b| (empirical CDFs at
    bucket granularity — within one alpha-bucket of the exact KS
    statistic). The scale path for distribution comparison: the exact
    KS needs a per-group SORT of raw values; this is a row-local fold
    over two O(#buckets) maps, and the inputs are the same mergeable
    states the monitoring pipeline already keeps."""
    keys = F.array_sort(F.array_union(F.map_keys(a), F.map_keys(b)))
    na = dd_total(a).cast("double")
    nb = dd_total(b).cast("double")
    zero = F.lit(0).cast("long")
    init = F.struct(
        zero.alias("ca"), zero.alias("cb"), F.lit(0.0).alias("d")
    )
    fold = F.aggregate(
        keys,
        init,
        lambda acc, k: F.struct(
            (acc["ca"] + F.coalesce(F.element_at(a, k), zero)).alias("ca"),
            (acc["cb"] + F.coalesce(F.element_at(b, k), zero)).alias("cb"),
            F.greatest(
                acc["d"],
                F.abs(
                    (acc["ca"] + F.coalesce(F.element_at(a, k), zero)).cast("double") / na
                    - (acc["cb"] + F.coalesce(F.element_at(b, k), zero)).cast("double") / nb
                ),
            ).alias("d"),
        ),
    )
    return fold["d"]


# --- HyperLogLog -------------------------------------------------------------
#
# The classic cardinality sketch next to KMV: m = 2^p registers, each
# the max leading-zero run (rho) of hashes landing in its bucket.
# Unlike KMV's k-array state the HLL state is FIXED-SIZE (m small
# ints), merge is register-wise MAX (semilattice: associative,
# commutative, idempotent — per-shard states + one merge == one
# global pass), and the whole path here is INTEGER arithmetic built
# for cross-engine replay:
#   * hash = first 9 hex digits of md5 (36 bits) parsed as an int —
#     both engines produce identical lowercase md5 hex;
#   * rho via bit-length = length(bin(w)) — a string op both engines
#     define identically (no float log2);
#   * the harmonic sum Σ 2^-M_j is carried SCALED by 2^(W+1) (W = 36-p
#     hash bits per bucket, M_j <= W+1) — every term 2^(W+1-M_j) is an
#     exact BIGINT, so the sum is exact;
#   * the raw estimate alpha_m · m² / Σ2^-M_j becomes one BIGINT
#     floor division with alpha_m = 7213·m/(10000·m + 10790) kept as
#     an exact rational (numerator/denominator never evaluated as
#     floats).
# The small-range linear-counting correction (E <= 2.5m needs
# m·ln(m/V)) is inherently float; it is NOT folded into the hashed
# face — `hll_linear_count` applies it driver/consumer-side, and the
# state carries n_zero so any consumer can. 36 hash bits cap the
# estimable range well above 10^9 distinct (collisions merge items,
# shaving the estimate long after HLL's own ~1.04/sqrt(m) error
# dominates).


def _hll_bucket_rho(
    value: Column, p: int = 6, hex_digits: int = 9
) -> tuple[Column, Column]:
    """(bucket, rho) for one value: bucket = low p bits of the 4·hex
    digit md5 prefix, rho = leading zeros of the remaining W bits,
    plus 1 (w == 0 -> W + 1, the all-zeros case)."""
    w_bits = 4 * hex_digits - p
    h = F.conv(F.substring(F.md5(value.cast("string")), 1, hex_digits), 16, 10)
    h = h.cast("long")
    bucket = (h % F.lit(1 << p)).cast("int")
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - F.length(F.bin(w))
    )
    return bucket, rho.cast("int")


def hll_state(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p: int = 6,
    hex_digits: int = 9,
    out_col: str = "hll",
) -> DataFrame:
    """Per-group HLL state: a dense array of m = 2^p registers
    (0 = bucket never hit). Two narrow aggregations — per-(group,
    bucket) MAX rho with map-side partial max, then m rows folded
    into one array per group. At 100 TB the shuffle carries at most
    m rows per group per partition; the state itself is ~m bytes."""
    groups = list(group_cols)
    m = 1 << p
    bucket, rho = _hll_bucket_rho(F.col(value_col), p, hex_digits)
    per_bucket = (
        df.select(*groups, bucket.alias("__b"), rho.alias("__r"))
        .where(F.col("__b").isNotNull())  # NULL values carry no identity
        .groupBy(*groups, "__b")
        .agg(F.max("__r").alias("__mr"))
    )
    mp = F.map_from_entries(
        F.collect_list(F.struct(F.col("__b"), F.col("__mr")))
    )
    # aggregate the sparse (bucket -> max rho) map per group, THEN
    # densify it into the fixed m-slot array (0 = never hit)
    return (
        per_bucket.groupBy(*groups)
        .agg(mp.alias("__mp"))
        .select(
            *groups,
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.coalesce(F.element_at(F.col("__mp"), j), F.lit(0)),
            ).alias(out_col),
        )
    )


def hll_merge(a: Column, b: Column) -> Column:
    """Row-local register-wise max — the HLL semilattice merge."""
    return F.zip_with(a, b, lambda x, y: F.greatest(x, y))


def hll_harmonic_scaled(state: Column, p: int = 6, hex_digits: int = 9) -> Column:
    """Σ 2^(W+1-M_j) as an exact BIGINT (the harmonic sum scaled by
    2^(W+1); W+1 caps at 31 for the default 9-hex-digit hash, so the
    sum fits a long with m <= 2^12 to spare)."""
    w_bits = 4 * hex_digits - p
    # 2^(W+1-r) via a literal power table (r in [0, W+1]) — Spark's
    # shiftleft takes a Python int for the bit count, not a Column
    powers = F.array(
        *[F.lit(1 << (w_bits + 1 - k)).cast("long") for k in range(w_bits + 2)]
    )
    return F.aggregate(
        state,
        F.lit(0).cast("long"),
        lambda acc, r: acc + F.element_at(powers, r + 1),
    )


def hll_estimate(state: Column, p: int = 6, hex_digits: int = 9) -> Column:
    """Raw HLL estimate as an EXACT integer floor division, with
    alpha_m = 7213·m / (10000·m + 10790) held as a rational:

        E = alpha_m·m² / Σ2^-M_j = 7213·m³·2^(W+1) / (alpha_den · S)

    evaluated as floor(floor(num / alpha_den) / S) — the nested-floor
    identity for positive integers, with the FIRST division folded at
    plan-build time in Python (num and alpha_den are both constants).
    The remaining quotient q1 < 2^43, so (q1 - q1 % S) / S is an
    exactly-divisible division of doubles below 2^53 — bit-exact on
    any IEEE engine, no decimal rounding modes involved."""
    m = 1 << p
    w_bits = 4 * hex_digits - p
    num = 7213 * m * m * m * (1 << (w_bits + 1))
    den_factor = 10000 * m + 10790
    q1 = num // den_factor
    if q1 >= 1 << 52:
        raise ValueError(f"p={p}, hex_digits={hex_digits} overflows the exact path")
    s = hll_harmonic_scaled(state, p, hex_digits)
    q1c = F.lit(q1).cast("long")
    return ((q1c - q1c % s) / s).cast("long")


def hll_n_zero(state: Column) -> Column:
    """Count of never-hit registers — the input to linear counting."""
    return F.size(F.filter(state, lambda r: r == 0))


def hll_linear_count(m: int, n_zero: int) -> float:
    """Driver/consumer-side small-range correction (E <= 2.5m):
    m·ln(m/V). Deliberately OUTSIDE the hashed face — ln is float."""
    if n_zero <= 0:
        raise ValueError("linear counting needs at least one zero register")
    return m * math.log(m / n_zero)
