"""Analytic core: deterministic argmax, top-k-per-group, lag,
forward-fill (SURVEY.md §2.4 A1-A5, §2.5 W1-W3, §2.1 S3).

Scale notes baked into each operator's plan shape:
  * grouped argmax is a hash aggregate (map-side partial + final) —
    one shuffle on the group keys, no sort, no window;
  * top-k-per-group is a window only when k>1 or ranks are needed;
    k=1 callers should prefer `arg_max` (avoids full partition sort);
  * `lag`/`forward_fill` over a GLOBAL order (no partition keys) put
    the whole dataset into one window partition — fine for per-election
    grain (12 rows, reference W3), a hazard in general; these raise
    unless `allow_global=True`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _cols(cols: Sequence[ColumnOrName]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def _ordering_struct(
    order_by: ColumnOrName, tiebreak: Sequence[ColumnOrName]
) -> Column:
    """Total-order key: (order_by, *tiebreak) as a struct — structs
    compare lexicographically, pinning argmax tie semantics
    (reference W1 relies on non-deterministic MAX_BY ties,
    nfl-elec-transform-v2.py:98-99; we refuse to).
    """
    return F.struct(*_cols([order_by, *tiebreak]))


def arg_max(
    df: DataFrame,
    group_by: Sequence[ColumnOrName],
    select: dict[str, ColumnOrName],
    order_by: ColumnOrName,
    tiebreak: Sequence[ColumnOrName] = (),
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Per-group argmax: for each group, the value(s) of `select`
    columns on the row maximizing (order_by, *tiebreak).

    Implements reference A1/W1 (`MAX_BY`) as ONE hash aggregate —
    `max_by(x, struct(ord, tie...))` — with deterministic ties, instead
    of a window + filter (which would shuffle AND sort every
    partition). At 100 TB this is the difference between a map-side
    combinable agg and a full-sort window.
    """
    key = _ordering_struct(order_by, tiebreak)
    aggs = [
        F.max_by(F.col(c) if isinstance(c, str) else c, key).alias(out)
        for out, c in select.items()
    ]
    for out, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(out))
    return df.groupBy(*_cols(group_by)).agg(*aggs)


def arg_min(
    df: DataFrame,
    group_by: Sequence[ColumnOrName],
    select: dict[str, ColumnOrName],
    order_by: ColumnOrName,
    tiebreak: Sequence[ColumnOrName] = (),
) -> DataFrame:
    """Per-group argmin with deterministic ties (see arg_max)."""
    key = _ordering_struct(order_by, tiebreak)
    aggs = [
        F.min_by(F.col(c) if isinstance(c, str) else c, key).alias(out)
        for out, c in select.items()
    ]
    return df.groupBy(*_cols(group_by)).agg(*aggs)


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[ColumnOrName],
    order_by: Sequence[Column],
    k: int = 1,
    method: str = "row_number",
    rank_col: str | None = None,
) -> DataFrame:
    """Top-k rows per group: window rank + filter (reference W2+P7
    pattern, nfl-elec-transform-v2.py:236,254-255,279/290).

    `method`: 'row_number' (exactly k rows, caller must make order_by a
    total order for determinism), 'rank' or 'dense_rank' (keeps ties —
    the reference's RANK()=1 semantics). If `rank_col` is given the
    rank is kept in the output (reference keeps `diff_rank_asc`).
    """
    fns = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}
    if method not in fns:
        raise ValueError(f"method must be one of {sorted(fns)}")
    w = Window.partitionBy(*_cols(partition_by)).orderBy(*order_by)
    name = rank_col or "__rnk"
    out = df.withColumn(name, fns[method]().over(w)).filter(F.col(name) <= k)
    return out if rank_col else out.drop(name)


def _window(
    partition_by: Sequence[ColumnOrName],
    order_by: Sequence[ColumnOrName],
    allow_global: bool,
    op: str,
):
    if not partition_by and not allow_global:
        raise ValueError(
            f"{op} with no partition keys funnels ALL rows through one "
            "window partition — a single-task bottleneck at scale. Pass "
            "partition_by, or allow_global=True for provably-tiny "
            "relations (e.g. one row per election)."
        )
    w = Window.orderBy(*_cols(order_by))
    if partition_by:
        w = Window.partitionBy(*_cols(partition_by)).orderBy(*_cols(order_by))
    return w


def lag_over(
    df: DataFrame,
    col: ColumnOrName,
    order_by: Sequence[ColumnOrName],
    partition_by: Sequence[ColumnOrName] = (),
    offset: int = 1,
    out: str = "lag",
    allow_global: bool = False,
) -> DataFrame:
    """LAG (reference W3, nfl-elec-transform-v2.py:197-198,240)."""
    w = _window(partition_by, order_by, allow_global, "lag_over")
    c = F.col(col) if isinstance(col, str) else col
    return df.withColumn(out, F.lag(c, offset).over(w))


def forward_fill(
    df: DataFrame,
    col: ColumnOrName,
    order_by: Sequence[ColumnOrName],
    partition_by: Sequence[ColumnOrName] = (),
    out: str | None = None,
    allow_global: bool = False,
) -> DataFrame:
    """Forward-fill nulls from the last non-null earlier row
    (reference S3: election-year forward fill done row-at-a-time in
    Python, jobs/ingest/elections.py:48-62 — here one window pass:
    `last(col, ignorenulls=True)` over rowsBetween(unboundedPreceding,
    current)).
    """
    w = _window(partition_by, order_by, allow_global, "forward_fill").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = F.col(col) if isinstance(col, str) else col
    name = out or (col if isinstance(col, str) else "filled")
    return df.withColumn(name, F.last(c, ignorenulls=True).over(w))


def islands(
    df: DataFrame,
    partition_by: Sequence[ColumnOrName],
    date_col: ColumnOrName,
) -> DataFrame:
    """Gaps-and-islands: group each partition's DISTINCT dates into
    maximal runs of consecutive days.

    Returns DataFrame[*partition_by, island_start, island_end,
    island_days] — one row per island. Classic anchor trick:
    `date - row_number() days` is constant within a consecutive run,
    so one window (per-key sort) + one hash agg, no self-join. At
    100 TB the window partitions by the entity key (bounded per-key
    history), never globally.
    """
    keys = _cols(partition_by)
    d = (F.col(date_col) if isinstance(date_col, str) else date_col).cast("date")
    days = df.select(*keys, d.alias("_d")).distinct()
    w = Window.partitionBy(*[F.col(c) if isinstance(c, str) else c
                             for c in partition_by]).orderBy("_d")
    anchored = days.withColumn(
        "_anchor", F.date_sub(F.col("_d"), F.row_number().over(w))
    )
    return (
        anchored.groupBy(*[F.col(c) if isinstance(c, str) else c
                           for c in partition_by], "_anchor")
        .agg(
            F.min("_d").alias("island_start"),
            F.max("_d").alias("island_end"),
            F.count(F.lit(1)).alias("island_days"),
        )
        .drop("_anchor")
    )


def time_weighted_avg(
    df: DataFrame,
    partition_by: Sequence[ColumnOrName],
    ts_col: ColumnOrName,
    value_col: ColumnOrName,
    tiebreak: Sequence[ColumnOrName] = (),
    out: str = "twa",
) -> DataFrame:
    """Time-weighted average per key: each observation holds its value
    until the next one; the last observation carries no weight
    (standard TWAP over an irregular series).

    Weights are exact integer microsecond spans (`epoch_us(next) -
    epoch_us(ts)`), so the only float arithmetic is the final
    value*span sum — deterministic enough for a 4-decimal contract.
    One window (per-key LEAD, `tiebreak` pins equal-timestamp order:
    a tied pair yields one zero-width span, and WHICH value gets it
    must not depend on shuffle order) + one hash agg; keys with a
    single observation are dropped (no interval to weigh).
    """
    from redskins_rule_spark.functions.dates import epoch_us

    keys = _cols(partition_by)
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    spans = (
        df.select(*keys, v.alias("_v"), epoch_us(ts).alias("_us"),
                  *_cols(tiebreak))
        .withColumn("_span", F.lead("_us").over(
            Window.partitionBy(*keys).orderBy("_us", *_cols(tiebreak))
        ) - F.col("_us"))
        .where(F.col("_span").isNotNull())
    )
    return spans.groupBy(*keys).agg(
        (F.sum(F.col("_v") * F.col("_span")) / F.sum("_span")).alias(out),
        F.count(F.lit(1)).alias("n_spans"),
    )


def equi_width_histogram(
    df: DataFrame,
    col: ColumnOrName,
    bins: int,
) -> DataFrame:
    """Equi-width histogram: `bins` equal-width buckets spanning the
    observed [min, max]; the max value folds into the last bucket.

    Two passes — a 1-row global (min, max) aggregate broadcast-joined
    onto the scan, then a hash agg on the bucket id. No collect(): the
    bounds ride the plan as a broadcast nested-loop join of a single
    row, so the same code runs unchanged on a cluster.

    Returns DataFrame[bin_id, bin_lo, bin_hi, n] with bin edges
    rounded to 4 decimals for a stable cross-engine contract.
    """
    c = F.col(col) if isinstance(col, str) else col
    src = df.select(c.cast("double").alias("_x")).where(F.col("_x").isNotNull())
    bounds = src.agg(
        F.min("_x").alias("_lo"), F.max("_x").alias("_hi")
    ).withColumn("_w", (F.col("_hi") - F.col("_lo")) / F.lit(float(bins)))
    binned = src.join(F.broadcast(bounds)).select(
        F.when(F.col("_w") == 0, F.lit(0))  # degenerate: all values equal
        .otherwise(
            F.least(
                F.floor((F.col("_x") - F.col("_lo")) / F.col("_w")).cast("int"),
                F.lit(bins - 1),
            )
        )
        .alias("bin_id"),
        "_lo",
        "_w",
    )
    return (
        binned.groupBy("bin_id")
        .agg(
            F.round(F.min(F.col("_lo") + F.col("bin_id") * F.col("_w")), 4)
            .alias("bin_lo"),
            F.round(F.min(F.col("_lo") + (F.col("bin_id") + 1) * F.col("_w")), 4)
            .alias("bin_hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-sweep data-profiling report over numeric columns.

    Returns one row per column: (col, n_rows, n_null, n_distinct,
    min_v, max_v, avg_v) with values cast to double and min/max/avg
    rounded to 4 decimals. The EXACT distinct count comes from a
    (col, value) pre-aggregation rather than N count-distincts in one
    agg — the latter plans an Expand that replicates every input row
    N times; the pair shape scans once, combines map-side, and
    shuffles at most one (col, value) row per distinct value per
    partition. NULLs group like any other value, so null counting
    rides the same pass. Ingest-gate profiling for schema-drift /
    quality checks before a 100 TB corpus build.
    """
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.col", "p.v")
    per_val = pairs.groupBy("col", "v").agg(F.count(F.lit(1)).alias("n"))
    nn = F.when(F.col("v").isNotNull(), F.col("n"))
    return per_val.groupBy("col").agg(
        F.sum("n").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("v").isNull(), F.col("n"))), F.lit(0).cast("long")
        ).alias("n_null"),
        F.count("v").alias("n_distinct"),
        F.round(F.min("v"), 4).alias("min_v"),
        F.round(F.max("v"), 4).alias("max_v"),
        # avg rounds one digit coarser than min/max: the sum of double
        # products accumulates in engine/partition-dependent order, so
        # its ~1e-9-relative jitter needs a rounding boundary (5e-4)
        # orders of magnitude wider than the error, or a differential
        # harness can flip the last digit between engines
        F.round(F.sum(F.col("v") * F.col("n")) / F.sum(nn), 3).alias("avg_v"),
    )


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bins: int = 10,
    smooth: float = 0.5,
) -> DataFrame:
    """Population-stability-index drift report between a reference
    and a current sample of one numeric column — the standard
    train-vs-serve / period-over-period distribution-shift monitor.

    Binning is equi-width over the REFERENCE min/max (the deployed
    contract); current values outside the range clamp into the edge
    bins. Shares are additive-smoothed, (n + smooth)/(N + smooth·B),
    so empty bins contribute finite terms with no eps special-cases
    — deterministically, which keeps the whole report cross-engine
    hash-checkable (workload q154). PSI = Σ terms; < 0.1 stable,
    > 0.25 action.

    One agg per side for bounds + bins, a B-row spine join to make
    every bin present in the output — nothing data-sized leaves the
    two scans. Returns (bin_id, n_ref, n_cur, term).
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    v = F.col(value_col).cast("double")
    # degenerate reference (constant / single value): hi == lo would
    # make the width 0 and every bucket expression NaN/Inf — which
    # Spark's casts silently clamp into bin 0, reporting "no drift"
    # for arbitrarily-shifted current data. Width 1 keeps the
    # arithmetic finite: all ref rows land in bin 0, current rows
    # spread by their distance from the constant, so drift is SEEN.
    bounds = ref.agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi")
    ).withColumn(
        "_w",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(1.0)).otherwise(
            (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
        ),
    )

    def side_counts(df: DataFrame, out: str) -> DataFrame:
        # clamp on the LONG floor result BEFORE the int cast: a current
        # value far outside the reference range can floor past 2^31, and
        # the non-ANSI int cast would wrap it negative — landing an
        # extreme-high outlier in bin 0 and inverting the drift signal.
        b = F.least(
            F.greatest(
                F.floor((v - F.col("_lo")) / F.col("_w")), F.lit(0).cast("long")
            ),
            F.lit(bins - 1).cast("long"),
        ).cast("int")
        return (
            df.where(v.isNotNull())
            .join(F.broadcast(bounds))
            .groupBy(b.alias("bin_id"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    spine = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin_id")
    )
    r = side_counts(ref, "n_ref")
    c = side_counts(cur, "n_cur")
    joined = (
        spine.join(r, "bin_id", "left")
        .join(c, "bin_id", "left")
        .select(
            "bin_id",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    return psi_from_counts(joined, bins, smooth)


def psi_from_counts(
    counts: DataFrame, bins: int, smooth: float = 0.5
) -> DataFrame:
    """PSI terms from an already-binned (bin_id, n_ref, n_cur) frame
    covering the full spine — the entry point for drift monitoring
    off MAINTAINED histograms (e.g. bin counts kept current by
    `streaming.run_incremental_view`): the reference contract stays
    fixed, the current counts fold in per micro-batch, and the PSI
    read never re-scans data."""
    tot = counts.agg(
        F.sum("n_ref").alias("_tr"), F.sum("n_cur").alias("_tc")
    )
    p = (F.col("n_ref") + F.lit(smooth)) / (F.col("_tr") + F.lit(smooth * bins))
    q = (F.col("n_cur") + F.lit(smooth)) / (F.col("_tc") + F.lit(smooth * bins))
    return counts.join(F.broadcast(tot)).select(
        "bin_id", "n_ref", "n_cur", ((p - q) * F.log(p / q)).alias("term")
    )


def interpolate_linear(
    df: DataFrame,
    partition_by: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str = "interp",
) -> DataFrame:
    """Linear interpolation of interior nulls in a per-key series:
    each null takes prev + (next − prev)·(t − t_prev)/(t_next − t_prev)
    between its nearest non-null neighbors; leading/trailing nulls
    (no neighbor on one side) stay null. The gap-repair step after a
    spine join (gap_fill's COALESCE(…, 0) sibling for quantities
    where zero is a lie — sensor readings, rates, prices).

    `order_col` must be numeric (distance arithmetic). Two windows
    per key (running last / leading first, IGNORE NULLS), no
    self-joins — one pass either side.
    """
    keys = list(partition_by)
    if not keys:
        raise ValueError("partition_by must be non-empty (global series "
                         "would serialize through one task)")
    v = F.col(value_col).cast("double")
    t = F.col(order_col).cast("double")
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_t = F.when(v.isNotNull(), t)
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    prev_t = F.last(known_t, ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_t = F.first(known_t, ignorenulls=True).over(w_fwd)
    interp = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
    # a null row TIED on order_col with observed rows on both sides
    # would divide 0/0 into NaN (poisoning downstream aggregates, and
    # neither null nor a value); guard next_t > prev_t so ties stay
    # null — callers wanting tie repair add a tiebreaker to order_col
    return df.withColumn(
        out_col,
        F.when(v.isNotNull(), v).otherwise(
            F.when(
                prev_v.isNotNull() & next_v.isNotNull() & (next_t > prev_t),
                interp,
            )
        ),
    )


def int_islands(
    df: DataFrame,
    partition_by: Sequence[str],
    idx_col: str,
) -> DataFrame:
    """Gaps-and-islands over an INTEGER sequence — the `islands`
    anchor trick (idx − row_number constant within a consecutive run)
    for frame indices, shard positions, block numbers. One per-key
    window + one hash agg, no self-join. Returns one row per island:
    (*partition_by, island_start, island_end, island_len). Duplicate
    indices are collapsed first (DISTINCT), matching `islands`."""
    keys = list(partition_by)
    if not keys:
        raise ValueError("partition_by must be non-empty")
    rows = df.select(*keys, F.col(idx_col).cast("long").alias("_i")).distinct()
    w = Window.partitionBy(*keys).orderBy("_i")
    anchored = rows.withColumn("_a", F.col("_i") - F.row_number().over(w))
    return (
        anchored.groupBy(*keys, "_a")
        .agg(
            F.min("_i").alias("island_start"),
            F.max("_i").alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .drop("_a")
    )


# Poisson(1) CDF, k = 0..7 — shortest-round-trip literals so any
# engine parses the identical doubles (tail mass beyond 7 ~1e-5 maps
# to weight 8; bias is negligible against bootstrap noise).
_POISSON1_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253,
)


def poisson1_weight(u: Column) -> Column:
    """Deterministic Poisson(1) draw from a uniform u in [0, 1):
    inverse-CDF over literal thresholds (pure CASE chain)."""
    w = F.lit(8)
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w


def bootstrap_ci(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: Column,
    key_hash: Column,
    n_boot: int = 32,
    lo_q: float = 0.025,
    hi_q: float = 0.975,
) -> DataFrame:
    """Poisson-bootstrap confidence interval of the per-group mean —
    THE scalable bootstrap: instead of materializing B resamples,
    every row gets B deterministic Poisson(1) weights (replicate r's
    weight from a seeded remix of the row's hash), and each
    replicate's weighted mean forms the empirical CI. ONE scan, an
    in-flight ×B explode into a map-side-combinable agg — no shuffle
    of raw data ×B, no driver collect beyond B means per group.

    value_col  : INTEGER-valued column (e.g. cents) — keeps replicate
                 sums exact, hence cross-engine hash-checkable.
    key_hash   : per-row hash in [0, 2^31-1) (e.g.
                 sampling.shuffle_hash of a unique key) — determinism
                 and rerun-stability come from it.
    Returns (group_cols..., n, mean_all, ci_lo, ci_hi): the plain
    mean plus the [lo_q, hi_q] bootstrap interval of it.
    """
    if n_boot < 4:
        raise ValueError(f"n_boot must be >= 4, got {n_boot}")
    # the remix constants ARE sampling.shuffle_hash's scramble family —
    # import the named values so the cross-engine contract (q161's
    # oracle spells the same literals) has one source of truth
    from redskins_rule_spark.functions.hashing import MERSENNE_31
    from redskins_rule_spark.operators.sampling import (
        _SHUFFLE_A,
        _SHUFFLE_B,
    )

    groups = list(group_cols)
    m = MERSENNE_31
    base = df.select(
        *groups,
        value_col.cast("long").alias("_x"),
        key_hash.cast("long").alias("_h"),
    )
    rep = base.select(
        *groups, "_x", "_h",
        F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("_r"),
    )
    u = (
        (F.lit(_SHUFFLE_A) * (F.col("_h") + F.col("_r")) + F.lit(_SHUFFLE_B)) % m
    ).cast("double") / F.lit(float(m))
    w = poisson1_weight(u).cast("long")
    # a replicate whose Poisson weights are ALL zero (P ≈ e^-n, only
    # plausible for tiny groups) has no resample to take a mean of:
    # 0/0 would yield NULL, collect_list would silently drop it, and a
    # static element_at(n_boot-based index) could then run past the
    # array end. Drop those replicates explicitly and index off the
    # ACTUAL replicate count instead.
    means = (
        rep.withColumn("_w", w)
        .groupBy(*groups, "_r")
        .agg(
            F.sum(F.col("_w") * F.col("_x")).alias("_swx"),
            F.sum("_w").alias("_sw"),
        )
        .where(F.col("_sw") > 0)
        .select(
            *groups,
            (F.col("_swx").cast("double") / F.col("_sw")).alias("_m"),
        )
    )
    overall = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("_x").cast("double") / F.count(F.lit(1))).alias("mean_all"),
    )
    sm = F.array_sort(F.collect_list("_m"))
    ci = (
        means.groupBy(*groups)
        .agg(sm.alias("_sm"))
        .select(
            *groups,
            F.element_at(
                "_sm",
                (F.floor(F.lit(lo_q) * (F.size("_sm") - 1)) + 1).cast("int"),
            ).alias("ci_lo"),
            F.element_at(
                "_sm",
                (F.floor(F.lit(hi_q) * (F.size("_sm") - 1)) + 1).cast("int"),
            ).alias("ci_hi"),
        )
    )
    return overall.join(ci, groups)
