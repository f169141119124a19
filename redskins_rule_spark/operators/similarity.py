"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast of the
query vector + one row-local expression per candidate + a top-k —
linear scan, no shuffle except the final top-k. The scale path is
`ivf_topk`: k-means-ish coarse quantization where each vector is
assigned to its nearest of C centroids (computed once, broadcast) and
queries probe only the closest `nprobe` cells — cutting the scan to
nprobe/C of the data, the IVF-flat design used by FAISS-style systems.

All dot/norm math is Catalyst expressions (zip_with + aggregate):
JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    d = norm(a) * norm(b)
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(a, b) / d)


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    id_col: str,
    vec_col: str,
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    Ties pinned by (rounded cosine desc, id asc).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), round_dp).alias("cos_sim"),
    )
    # orderBy + limit plans as TakeOrderedAndProject: per-partition
    # top-k then a k-row merge on the driver — NOT the global-window
    # row_number shape, which would single-partition-sort every
    # scored row. Ties pinned by (cos desc, id asc).
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def cosine_topk_for_id(
    df: DataFrame,
    target_id: int,
    id_col: str,
    vec_col: str,
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """Top-k neighbors of an in-table vector (self excluded), without
    collecting the query vector to the driver: cross-join against the
    single (broadcast) target row. `id_col` must be unique — duplicate
    target ids would score every candidate once per duplicate."""
    target = df.where(F.col(id_col) == target_id).select(
        F.col(vec_col).cast("array<double>").alias("__qv")
    )
    if not target.head(1):
        # an absent id would otherwise return an empty frame,
        # indistinguishable from "no neighbors"
        raise ValueError(f"{id_col}={target_id!r} not found")
    scored = (
        df.where(F.col(id_col) != target_id)
        .crossJoin(F.broadcast(target))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("__qv")), round_dp).alias("cos_sim"),
        )
    )
    # TakeOrderedAndProject (see cosine_topk) — no global-window sort
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


# A packed block is ONE aggregated row; Spark's 2 GB row/buffer limit
# applies long before executor memory does. Keep a wide margin for the
# struct/offset overhead collect_list adds on top of the raw vectors.
_MAX_BLOCK_BYTES = 256 << 20

# Per-task budget for the similarity slab inside a block-pair task:
# the query rows are CHUNKED so the numpy matrix is ~this many bytes
# regardless of block size. Without it, the x100 probe's 12.5k-row
# blocks made every task materialize a 1.25 GB na x nb matrix (plus
# rounding copies) — 32 concurrent tasks invited the kernel
# OOM-killer even though each PACKED block was only ~7 MB.
_SIM_SLAB_BYTES = 64 << 20


def _resolve_num_blocks(
    df: DataFrame,
    vec_col: str,
    num_blocks: int | None,
    block_bytes: int,
    op: str,
    validate: bool = True,
) -> tuple[int, int | None]:
    """Byte-budgeted block-count resolution shared by the block-packing
    operators (VERDICT r5): a packed block is one aggregated row, so
    its size must be a CHECKED contract — `num_blocks=None` derives B
    from ceil(n·row_bytes / block_bytes), and ANY sizing whose expected
    block exceeds `_MAX_BLOCK_BYTES` raises with the minimum feasible
    count. Returns (num_blocks, estimated total packed bytes) — the
    total also drives the broadcast-vs-copartition strategy choice in
    `cosine_pairs_blocked` (None when sizing was skipped).

    Sizing cost (ADVICE r6): the original max(size(vec)) aggregate
    read EVERY row's array — a full pass over the vector column before
    any real work, exactly wrong at the 100 TB design point. Now dim
    comes from ONE row (embedding corpora are fixed-dim; the packed
    rows themselves still hit the hard 2 GB ceiling loudly if a wildly
    ragged corpus defeats the estimate) and n from a column-pruned
    count (parquet answers it from footer metadata). A caller that
    already sized its blocks can skip even that with
    `validate=False` + explicit num_blocks — zero pre-scans."""
    if num_blocks is not None and not validate:
        return num_blocks, None
    # dim from one NON-NULL vector (ADVICE r7): an arbitrary first()
    # could sample a null row and silently disable the byte budget
    # (dim=0). Still one row, still metadata-cheap. On a RAGGED corpus
    # the sampled dim (hence the auto-derived block count) depends on
    # which row wins the limit-1 race — embedding corpora are fixed-dim
    # by contract, and the hard 2 GB packed-row ceiling still fails
    # loudly if raggedness defeats the estimate.
    head = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col).cast("array<double>")).alias("dim"))
        .first()
    )
    dim = (head["dim"] if head is not None else 0) or 0
    n = df.count()
    per_row = dim * 8 + 48  # 8 B/element + struct/id/offset overhead
    total = n * per_row
    if num_blocks is None:
        num_blocks = max(1, math.ceil(total / block_bytes))
    est = math.ceil(total / num_blocks)
    if est > _MAX_BLOCK_BYTES:
        need = math.ceil(total / _MAX_BLOCK_BYTES)
        raise ValueError(
            f"{op}: ~{est:,} bytes per packed block at "
            f"num_blocks={num_blocks} exceeds the {_MAX_BLOCK_BYTES:,}-byte "
            f"block ceiling (a block is ONE aggregated row) — pass "
            f"num_blocks>={need}, or num_blocks=None to auto-size from "
            f"block_bytes"
        )
    return num_blocks, total


# Packed-table ceiling for the broadcast (theta-join) pair layout: the
# BroadcastNestedLoopJoin ships the ENTIRE B-row packed table to every
# executor, so it is only sane while B·block_bytes stays well inside
# executor memory. Past this, `cosine_pairs_blocked` auto-switches to
# the co-partitioned explode layout (VERDICT r6 item 4 — the fallback
# the docstring used to promise in prose is now a code path).
_BROADCAST_PAIRS_BYTES = 1 << 30


def cosine_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    num_blocks: int | None = 16,
    round_dp: int = 4,
    block_bytes: int = 64 << 20,
    validate: bool = True,
    strategy: str = "auto",
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold via block-matrix multiply.

    The naive pair join evaluates an interpreted dot-product expression
    per pair — O(n²·d) lambda invocations. This operator instead
    shuffles each vector into one of `num_blocks` hash blocks and
    computes each of the ~B²/2 block pairs' full similarity matrix
    with ONE vectorized numpy matmul, in one of two physically
    different but value-identical layouts (pytest-pinned equal):

    - 'broadcast': pack each block into a single row (collect_list)
      and theta-join the B packed rows — a deliberate O(B²)
      BroadcastNestedLoopJoin over the block INDEX. Cheapest while the
      whole packed table fits comfortably in executor memory.
    - 'copartition': explode each vector to its B pair buckets
      (O(B·n)-row shuffle, the exact-all-pairs lower bound) and
      groupBy the bucket pair into applyInPandas — each task sees only
      its TWO blocks, nothing is broadcast, and no 2 GB aggregated row
      exists at all. The layout that survives when B·block_bytes
      outgrows what an executor can hold.

    `strategy='auto'` (default) picks by the sizing estimate: the
    copartition layout once the packed total exceeds
    `_BROADCAST_PAIRS_BYTES` (with `validate=False` sizing is skipped,
    so auto resolves to broadcast). Block sizing is a CHECKED byte
    budget (`_resolve_num_blocks`): num_blocks=None auto-sizes from
    n·row_bytes / block_bytes, and an over-budget explicit sizing
    raises rather than walking into Spark's 2 GB row ceiling. The
    all-pairs scan is the exact baseline — LSH/IVF are the 100 TB
    pruning paths. Final round+filter runs Spark-side so threshold
    semantics exactly match a SQL oracle (numpy only prefilters with
    an epsilon margin).
    """
    num_blocks, total = _resolve_num_blocks(
        df, vec_col, num_blocks, block_bytes, "cosine_pairs_blocked",
        validate=validate,
    )
    if strategy == "auto":
        strategy = (
            "copartition"
            if total is not None and total > _BROADCAST_PAIRS_BYTES
            else "broadcast"
        )
    if strategy not in ("broadcast", "copartition"):
        raise ValueError(
            "strategy must be 'auto', 'broadcast', or 'copartition'"
        )
    id_type = df.schema[id_col].dataType.simpleString()
    # prefilter must keep anything whose ROUNDED sim could pass the
    # final filter: round(s, dp) >= t  ⟺  s >= t - 0.5·10^-dp
    # (unconditional — `if round_dp` would break at round_dp=0)
    margin = threshold - 0.5 * 10.0 ** (-round_dp)
    if strategy == "copartition":
        raw = _cosine_pairs_copartitioned(
            df, id_col, vec_col, num_blocks, margin, id_type
        )
        return _orient_round_filter(raw, threshold, round_dp)
    packed = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("blk", F.pmod(F.hash("id"), F.lit(num_blocks)))
        .groupBy("blk")
        .agg(F.collect_list(F.struct("id", "v")).alias("items"))
    )
    # Upper-triangle theta self-join over the B packed block rows.
    # This plans as a BroadcastNestedLoopJoin — DELIBERATE and NOT the
    # quadratic-in-data anti-pattern: both sides are the B-row block
    # index (B ≈ 16), so the loop is O(B²) block-pair emissions and
    # each data vector is broadcast once inside its block row. That is
    # the block-matrix-multiply layout; once the packed table outgrows
    # `_BROADCAST_PAIRS_BYTES`, strategy='auto' takes the
    # co-partitioned explode layout above instead.
    pairs = (
        packed.alias("a")
        .join(packed.alias("b"), F.col("a.blk") <= F.col("b.blk"))
        .select(
            F.col("a.blk").alias("blk_a"),
            F.col("b.blk").alias("blk_b"),
            F.col("a.items").alias("items_a"),
            F.col("b.items").alias("items_b"),
        )
    )

    def block_cosine(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                ia = np.array([x["id"] for x in row["items_a"]])
                ib = np.array([x["id"] for x in row["items_b"]])
                va = np.array([np.asarray(x["v"]) for x in row["items_a"]], dtype=np.float64)
                vb = np.array([np.asarray(x["v"]) for x in row["items_b"]], dtype=np.float64)
                out.extend(
                    _pair_block_sims(
                        ia, va, ib, vb,
                        row["blk_a"] == row["blk_b"], margin,
                    )
                )
            if out:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate([o[0] for o in out]),
                        "id_b": np.concatenate([o[1] for o in out]),
                        "cos_sim": np.concatenate([o[2] for o in out]),
                    }
                )

    raw = pairs.mapInPandas(
        block_cosine, schema=f"id_a {id_type}, id_b {id_type}, cos_sim double"
    )
    return _orient_round_filter(raw, threshold, round_dp)


def _pair_block_sims(ia, va, ib, vb, same: bool, margin: float):
    """Shared similarity kernel of both `cosine_pairs_blocked`
    layouts: normalized chunked matmul of one block pair, upper
    triangle when `same`, margin prefilter. The a-rows are CHUNKED so
    the sim slab stays bounded (`_SIM_SLAB_BYTES`) regardless of
    block size — the x100 probe's kernel-OOM lesson; per-pair results
    are independent, so chunking is value-invisible. Returns a list
    of (id_a, id_b, sim) ndarray triples."""
    import numpy as np

    na = np.linalg.norm(va, axis=1, keepdims=True)
    nb = np.linalg.norm(vb, axis=1, keepdims=True)
    na[na == 0] = 1.0
    nb[nb == 0] = 1.0
    ua, ub = va / na, vb / nb
    out = []
    chunk = max(1, _SIM_SLAB_BYTES // (8 * max(1, len(ib))))
    for q0 in range(0, len(ia), chunk):
        sim = ua[q0: q0 + chunk] @ ub.T
        if same:
            keep = np.less.outer(ia[q0: q0 + chunk], ib)
            keep &= sim >= margin
        else:
            keep = sim >= margin
        ii, jj = np.nonzero(keep)
        out.append((ia[q0: q0 + chunk][ii], ib[jj], sim[ii, jj]))
    return out


def _cosine_pairs_copartitioned(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    num_blocks: int,
    margin: float,
    id_type: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The beyond-broadcast layout of `cosine_pairs_blocked`: every
    vector explodes to its `num_blocks` pair buckets — key
    (min(blk, j), max(blk, j)) with role 'a' (low side), 'b' (high
    side), or 's' (diagonal) — and each bucket group computes its
    block pair inside applyInPandas. O(B·n) shuffled rows (the
    exact-all-pairs lower bound); per-task memory is exactly the two
    blocks of one pair; NOTHING is broadcast and no collect_list row
    exists, so the 2 GB aggregated-row ceiling doesn't apply.

    `group_cols` scopes the all-pairs scan WITHIN each group (the
    bucket key becomes (group..., ba, bb)) — the SemDeDup shape,
    where pairs never cross cluster cells. Empty = the whole frame
    is one group (`cosine_pairs_blocked`'s layout)."""
    tagged = df.select(
        *[F.col(g) for g in group_cols],
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("blk", F.pmod(F.hash("id"), F.lit(num_blocks)))
    buckets = F.array(*[
        F.struct(
            F.least(F.col("blk"), F.lit(j)).alias("ba"),
            F.greatest(F.col("blk"), F.lit(j)).alias("bb"),
            F.when(F.col("blk") < j, F.lit("a"))
            .when(F.col("blk") > j, F.lit("b"))
            .otherwise(F.lit("s"))
            .alias("role"),
        )
        for j in range(num_blocks)
    ])
    exploded = tagged.select(
        *group_cols, "id", "v", F.explode(buckets).alias("bk")
    ).select(
        *group_cols, "id", "v",
        F.col("bk.ba").alias("ba"),
        F.col("bk.bb").alias("bb"),
        F.col("bk.role").alias("role"),
    )

    def group_cosine(key, pdf):
        import numpy as np
        import pandas as pd

        same = key[-2] == key[-1]
        if same:
            a_rows = b_rows = pdf
        else:
            a_rows = pdf[pdf["role"] == "a"]
            b_rows = pdf[pdf["role"] == "b"]
        if len(a_rows) == 0 or len(b_rows) == 0:
            return pd.DataFrame(columns=["id_a", "id_b", "cos_sim"])
        ia = a_rows["id"].to_numpy()
        ib = b_rows["id"].to_numpy()
        va = np.array([np.asarray(x) for x in a_rows["v"]], dtype=np.float64)
        vb = np.array([np.asarray(x) for x in b_rows["v"]], dtype=np.float64)
        out = _pair_block_sims(ia, va, ib, vb, same, margin)
        if not out:
            return pd.DataFrame(columns=["id_a", "id_b", "cos_sim"])
        return pd.DataFrame(
            {
                "id_a": np.concatenate([o[0] for o in out]),
                "id_b": np.concatenate([o[1] for o in out]),
                "cos_sim": np.concatenate([o[2] for o in out]),
            }
        )

    return exploded.groupBy(*group_cols, "ba", "bb").applyInPandas(
        group_cosine, schema=f"id_a {id_type}, id_b {id_type}, cos_sim double"
    )


def _orient_round_filter(
    raw: DataFrame, threshold: float, round_dp: int
) -> DataFrame:
    """Shared tail of both pair layouts: id_a < id_b is only
    guaranteed within same-block pairs (cross-block pairs arrive in
    block order), so normalize orientation, then round Spark-side and
    apply the threshold — semantics exactly matching a SQL oracle."""
    lo = F.when(F.col("id_a") < F.col("id_b"), F.col("id_a")).otherwise(F.col("id_b"))
    hi = F.when(F.col("id_a") < F.col("id_b"), F.col("id_b")).otherwise(F.col("id_a"))
    return (
        raw.select(
            lo.alias("id_a"), hi.alias("id_b"),
            F.round("cos_sim", round_dp).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def assign_ivf_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    out: str = "cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine).
    Centroids ship as literals (they're small by construction) — the
    assignment is row-local, partition-preserving; write the result
    partitioned by cell for IVF-pruned scans.

    Each centroid vector is rendered as ONE parsed SQL array literal
    rather than dim `F.lit` calls (the srp_signature_bits lesson,
    SURVEY §11.90): k-means training calls this PER ITERATION, so
    k·dim py4j round-trips per call compound. Python float repr
    round-trips exactly and Spark parses decimal doubles to the
    nearest double, so the shipped values are bit-identical."""
    def lit_vec(c: list[float]) -> Column:
        return F.expr(
            "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"
        )

    sims = F.array(*[
        F.struct(
            F.round(cosine(F.col(vec_col), lit_vec(c)), 6).alias("s"),
            F.lit(i).alias("i"),
        )
        for i, c in enumerate(centroids)
    ])
    return df.withColumn(out, F.array_max(sims)["i"])


def train_ivf_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    iters: int = 5,
    sample_rows: int | None = None,
) -> list[list[float]]:
    """Spherical k-means for IVF cells, distributed per iteration.

    Assignment is the row-local `assign_ivf_cells` expression; the
    update step computes per-cell mean vectors with ONE numpy pass per
    cell inside applyInPandas (k groups — bounded, tiny). Only the
    k×dim centroid matrix ever reaches the driver (it must: the next
    iteration's assignment expression embeds it as literals).

    Deterministic: init = the k vectors with the smallest ids; no RNG.
    `sample_rows` bounds the TRAINING set at scale (VERDICT r5 item
    8): k-means quality saturates long before billions of rows, so
    training every iteration on the full corpus is wasted scans.
    When set, training runs on the rows whose xxhash64(id) falls in a
    1/ceil(n/sample_rows) modulus slice — deterministic,
    partitioning-independent (same hash family as the seeded-shuffle
    operators), expression-only: one metadata count() plus a filter,
    no global window, no sort. The sample size is ~sample_rows
    (binomial, not exact-k — exactness buys nothing for k-means).
    Default None preserves full-corpus training (existing hashes
    unchanged); assignment of the FULL corpus is unaffected either
    way.
    """
    import math as _math

    import numpy as np

    if sample_rows is not None:
        if sample_rows < k:
            raise ValueError("sample_rows must be >= k")
        n = df.count()
        d = max(1, _math.ceil(n / sample_rows))
        # ADVICE r6: the modulus slice is ~binomial around sample_rows,
        # so an unlucky (or tiny) slice can hold fewer than k rows and
        # k-means would silently train fewer than k centroids. Verify
        # the slice size (one count) and widen the modulus until the
        # slice can seed k centroids; d == 1 degrades to full-corpus
        # training, where the init check below still enforces n >= k.
        full = df.select(id_col, vec_col)
        while d > 1:
            h = F.xxhash64(F.col(id_col).cast("string"), F.lit(7))
            sliced = full.where(F.pmod(h, F.lit(d)) == 0)
            if sliced.count() >= k:
                df = sliced
                break
            d //= 2
    init_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    if len(init_rows) < k:
        raise ValueError(
            f"k={k} exceeds the number of vectors ({len(init_rows)})"
        )
    centroids = [[float(x) for x in r[vec_col]] for r in init_rows]

    def cell_means(pdf):
        import pandas as pd

        vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        mean = vecs.mean(axis=0)
        norm = np.linalg.norm(mean)
        if norm > 0:
            mean = mean / norm
        return pd.DataFrame({"cell": [int(pdf["cell"].iloc[0])], "centroid": [mean.tolist()]})

    for _ in range(iters):
        assigned = assign_ivf_cells(
            df.select(F.col(vec_col).cast("array<double>").alias("v")),
            centroids,
            "v",
            out="cell",
        )
        new = (
            assigned.groupBy("cell")
            .applyInPandas(cell_means, "cell int, centroid array<double>")
            .collect()
        )
        by_cell = {r["cell"]: list(r["centroid"]) for r in new}
        # empty cells keep their previous centroid
        centroids = [by_cell.get(i, centroids[i]) for i in range(k)]
    return centroids


def ivf_topk(
    df: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 2,
    cell_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the `nprobe` cells whose centroids
    are closest to the query, then exact cosine within those cells.

    With `cell_col` pre-assigned (and ideally the table written
    partitioned by it), the non-probed cells are partition-pruned at
    scan time — the 100 TB path reads nprobe/C of the data.
    """
    import math

    def cos_py(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    order = sorted(range(len(centroids)), key=lambda i: -cos_py(centroids[i], query_vec))
    probed = order[:nprobe]
    if cell_col is None:
        df = assign_ivf_cells(df, centroids, vec_col, out="__cell")
        cell_col = "__cell"
    pruned = df.where(F.col(cell_col).isin(probed))
    return cosine_topk(pruned.drop("__cell"), query_vec, id_col, vec_col, k)


# --- product quantization (PQ) -------------------------------------------


def _l2_sq(a: F.Column, b: F.Column) -> F.Column:
    """Squared L2 distance between two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def _sub(vec_col: str, start: int, width: int) -> F.Column:
    return F.slice(F.col(vec_col).cast("array<double>"), start + 1, width)


def train_pq_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    k: int = 16,
    iters: int = 5,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split each vector into `m`
    contiguous subspaces and run a deterministic L2 k-means in each
    (init = the k subvectors with smallest ids, no RNG; update = plain
    per-cell numpy means inside applyInPandas, k bounded groups).

    Returns m codebooks of k centroids each. Only the m·k·(dim/m) =
    k·dim floats of codebook ever reach the driver — they must, since
    the encode expression embeds them as literals.

    PQ vs IVF (`train_ivf_centroids`): IVF prunes WHICH rows are
    scanned; PQ compresses WHAT is scanned (dim floats → m bytes per
    row, ~dim·4/m× smaller) with distances estimated from an m×k
    lookup table. At 100 TB the two compose: IVF partition pruning
    first, ADC scan over PQ codes second, exact re-rank of the short
    candidate list last.
    """
    # Only the (subspace, id, subvector) explosion below is
    # materialized — the dim probe and the init collect are one cheap
    # narrow scan each, so a separate checkpoint of the raw projection
    # bought nothing but its own eager job (r13). Contract: the caller
    # passes a SAMPLE for large corpora (codebooks need thousands of
    # vectors, not billions), so this is bounded.
    df = df.select(id_col, vec_col)
    dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    w = dim // m

    init_rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(f"k={k} exceeds vector count {len(init_rows)}")
    books: list[list[list[float]]] = [
        [[float(x) for x in r[vec_col][s * w : (s + 1) * w]] for r in init_rows]
        for s in range(m)
    ]

    # The (subspace, id, subvector) explosion is the one relation the
    # loop touches; materialize it once. The whole loop is JVM-side —
    # no Python workers, no per-element literal blow-up (see the
    # parsed-SQL argmin note below).
    sub_exploded = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("s"),
                    F.col(id_col).alias("id"),
                    _sub(vec_col, s * w, w).alias("v"),
                )
                for s in range(m)
            ])
        ).alias("e")
    ).select("e.s", "e.id", "e.v").localCheckpoint(eager=True)

    # aggregation columns are iteration-independent — build once
    agg_cols = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.col("v")[i]).alias(f"c{i}") for i in range(w)
    ]

    def _argmin_sql(book: list[list[float]]) -> str:
        # the k-way (round(l2², 9), i) argmin as ONE parsed SQL string
        # (the pq_encode shape): aggregate/zip_with replay `_l2_sq`'s
        # fold exactly, repr(float) `D` literals round-trip doubles
        entries = ", ".join(
            "named_struct('d', round(aggregate(zip_with(v, array("
            + ",".join(f"{float(c)!r}D" for c in cent)
            + "), (x, y) -> (x - y) * (x - y)), 0.0D, (acc, d) -> acc + d), 9), 'i', "
            + str(i)
            + ")"
            for i, cent in enumerate(book)
        )
        return f"array_min(array({entries})).i"

    for _ in range(iters):
        # Assignment as a row-local argmin rendered as ONE parsed SQL
        # CASE over the m subspaces (r13; previously a broadcast join
        # against a VALUES codebook frame + a groupBy(s, id) min_by to
        # undo the k-way fan-out + a second shuffled aggregation —
        # measured 0.8-1 s of driver orchestration per iteration for
        # ~0.2 s of task work). Building the argmin via Column ops
        # would cost ~3 s of py4j per iteration (the srp/IVF literal
        # lesson one level up — that IS the 'literal blow-up' the old
        # join shape was avoiding); the parsed-SQL form is one py4j
        # call and analyzes in ms. Each iteration is now one narrow
        # job: checkpoint scan → argmin project → per-(s, cell)
        # count+sum aggregation → k·m-row collect. The per-(s, cell)
        # float sums accumulate in a different physical order than the
        # old two-step shape — trained means can drift in the last
        # ulp, inside the ROUND(·, 9)/(·, 6) contracts downstream
        # (q97 is rows-only by design; the hashed sibling q97b pins
        # the encode/ADC path with FIXED codebooks).
        case_sql = (
            "CASE "
            + " ".join(
                f"WHEN s = {s} THEN {_argmin_sql(books[s])}" for s in range(m)
            )
            + " END"
        )
        new = (
            sub_exploded.select("s", "v", F.expr(case_sql).alias("cell"))
            .groupBy("s", "cell")
            .agg(*agg_cols)
            .collect()
        )
        got = {
            (r["s"], r["cell"]): [float(r[f"c{i}"]) / r["n"] for i in range(w)]
            for r in new
        }
        books = [
            [got.get((s, i), books[s][i]) for i in range(k)] for s in range(m)
        ]
    return books


def axis_pq_codebooks(
    m: int, k: int, w: int
) -> list[list[list[float]]]:
    """FIXED axis-aligned PQ codebooks: every subspace's k centroids
    are the unit basis vectors e_0..e_{k-1} (requires k <= w). No
    training, no RNG, no engine-local state — which makes the ENTIRE
    PQ path (encode -> ADC lookup -> top-k) replayable by a SQL
    oracle: l2²(v_s, e_i) = Σ_t (v_t - [t==i])², an ordered fold any
    engine reproduces, so `pq_encode`'s argmin and `pq_topk`'s LUT
    become hash-checkable (VERDICT r7 item 6 — the q43b/q25b pattern
    applied to PQ). k-means-trained codebooks (`train_pq_codebooks`)
    remain the production face; these are the cross-engine
    verification face."""
    if k > w:
        raise ValueError(f"axis codebooks need k <= w, got k={k} w={w}")
    # fresh inner lists per subspace — aliasing one shared book would
    # make a caller's in-place tweak silently edit every subspace
    return [
        [[1.0 if t == i else 0.0 for t in range(w)] for i in range(k)]
        for _ in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str,
    out: str = "code",
) -> DataFrame:
    """Encode each vector as m codebook indices (row-local expression,
    partition-preserving; the compressed column is what a 100 TB
    deployment persists and scans)."""
    m = len(codebooks)
    w = len(codebooks[0][0])
    # The whole m·k-way argmin renders as ONE parsed SQL expression —
    # not m·k·w Column ops through py4j (the srp/IVF literal lesson,
    # SURVEY §11.90, one level up: measured 3.0 s of driver-side
    # expression BUILDING per call at m=4, k=16, w=16). The SQL text
    # parses to the identical tree the Column form built: slice+cast =
    # `_sub`, aggregate(zip_with(...), 0.0D, ...) = `_l2_sq` (same
    # fold), named_struct/array_min = the (d, i) tie-break, and
    # repr(float) `D` literals round-trip doubles exactly.
    parts = []
    for s, book in enumerate(codebooks):
        sub = f"slice(cast({vec_col} as array<double>), {s * w + 1}, {w})"
        entries = ", ".join(
            "named_struct('d', round(aggregate(zip_with("
            + sub
            + ", array("
            + ",".join(f"{float(c)!r}D" for c in cent)
            + "), (x, y) -> (x - y) * (x - y)), 0.0D, (acc, d) -> acc + d), 9), 'i', "
            + str(i)
            + ")"
            for i, cent in enumerate(book)
        )
        parts.append(f"array_min(array({entries})).i")
    return df.withColumn(out, F.expr("array(" + ", ".join(parts) + ")"))


def pq_topk(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    id_col: str,
    k: int = 10,
    code_col: str = "code",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the m×k lookup table of
    (query-subvector → centroid) squared distances is computed
    driver-side (tiny), shipped as literals, and each row's estimated
    distance is m array lookups — no vector arithmetic on the scan."""
    m = len(codebooks)
    w = len(codebooks[0][0])
    lut = []
    for s, book in enumerate(codebooks):
        q = query_vec[s * w : (s + 1) * w]
        lut.append(
            [sum((x - y) ** 2 for x, y in zip(q, cent)) for cent in book]
        )
    score = None
    for s in range(m):
        term = F.element_at(
            F.array(*[F.lit(float(d)) for d in lut[s]]),
            F.col(code_col)[s] + 1,
        )
        score = term if score is None else score + term
    return (
        df.select(id_col, F.round(score, 6).alias("approx_dist"))
        .orderBy(F.asc("approx_dist"), F.asc(id_col))
        .limit(k)
    )


# --- scalar quantization (SQ8) --------------------------------------------
#
# The third compression point on the ANN spectrum next to IVF (prune
# WHICH rows) and PQ (compress to m codebook bytes): SQ8 keeps every
# dimension but stores it as one affine-quantized byte — 4× smaller
# than float32 with near-exact recall, the FAISS `SQ8` / Milvus
# `SCALAR_QUANTIZER` workhorse. Unlike PQ there is NO trained
# codebook, only per-dimension (min, max) bounds, so the entire path
# — train, encode, distance — is closed-form and a SQL oracle can
# replay it exactly: the affine map ((v - mn) * 255.0 / (mx - mn)) is
# a fixed three-op IEEE expression tree (identical bit results on any
# IEEE-754 engine given identical parenthesization), FLOOR/clamp are
# exact, and distances are pure INTEGER arithmetic from there on —
# zero float risk in the scored output, no ROUND contract needed.


def train_sq_bounds(
    df: DataFrame, vec_col: str, dim: int
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) bounds for SQ8 encoding.

    One narrow aggregation: posexplode → groupBy(pos) with map-side
    partial min/max, shuffling `dim` rows per partition and collecting
    exactly `dim` rows of metadata to the driver (the bounded-collect
    contract: k centroids / dim bounds, never row data). min/max are
    order-independent EXACT aggregates — unlike means there is no
    float-summation order hazard, so trained bounds are themselves
    cross-engine reproducible and the trained path (not just a
    fixed-bounds face) gets a value hash.

    At 100 TB: pass a hash-sample for training if the full scan is
    not already needed; bounds from a 1% sample are within quantizer
    resolution of the full corpus for any non-adversarial tail.
    """
    pe = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x")
    )
    rows = (
        pe.groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    got = {r["i"]: (float(r["mn"]), float(r["mx"])) for r in rows}
    if len(got) != dim:
        raise ValueError(f"expected {dim} dims, saw {sorted(got)[:5]}…")
    return [got[i] for i in range(dim)]


def _sq_code_expr(x: F.Column, mn: float, mx: float) -> F.Column:
    # ((x - mn) * 255.0) / (mx - mn): parenthesization is part of the
    # cross-engine contract — the oracle writes the same tree. mx==mn
    # (constant dimension) degenerates to code 0 on both sides.
    if mx == mn:
        return F.lit(0)
    scaled = ((x - F.lit(mn)) * F.lit(255.0)) / F.lit(mx - mn)
    return F.least(
        F.lit(255), F.greatest(F.lit(0), F.floor(scaled).cast("int"))
    )


def sq_encode(
    df: DataFrame,
    bounds: list[tuple[float, float]],
    vec_col: str,
    out: str = "sq_code",
) -> DataFrame:
    """Encode each vector as `dim` uint8-range ints (row-local JVM
    expression, partition-preserving — the 4×-compressed column is
    what a 100 TB deployment persists and scans)."""
    v = F.col(vec_col).cast("array<double>")
    codes = F.array(*[
        _sq_code_expr(F.element_at(v, i + 1), mn, mx)
        for i, (mn, mx) in enumerate(bounds)
    ])
    return df.withColumn(out, codes)


def sq_quantize_query(
    query_vec: list[float], bounds: list[tuple[float, float]]
) -> list[int]:
    """Driver-side quantization of the query vector — Python floats
    ARE IEEE doubles, so ((q - mn) * 255.0) / (mx - mn) + floor + clamp
    reproduces `sq_encode`'s codes bit-for-bit."""
    import math

    out = []
    for q, (mn, mx) in zip(query_vec, bounds):
        if mx == mn:
            out.append(0)
            continue
        c = math.floor(((q - mn) * 255.0) / (mx - mn))
        out.append(min(255, max(0, int(c))))
    return out


def sq_topk(
    df: DataFrame,
    query_codes: list[int],
    id_col: str,
    k: int = 10,
    code_col: str = "sq_code",
) -> DataFrame:
    """Symmetric integer-L2 top-k over SQ8 codes: Σ (c_v - c_q)² as a
    BIGINT fold (JVM codegen, no Python, no floats), then a pinned
    TakeOrderedAndProject on (sq_dist, id). Ties carry no float
    ambiguity — distances are exact integers."""
    qarr = F.array(*[F.lit(int(c)) for c in query_codes])
    dist = F.aggregate(
        F.zip_with(
            F.col(code_col),
            qarr,
            lambda a, b: (a - b).cast("long") * (a - b).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )
    return (
        df.select(id_col, dist.alias("sq_dist"))
        .orderBy(F.asc("sq_dist"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str = "query_id",
    query_vec_col: str | None = None,
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """Batched similarity serving: top-k corpus neighbors for EVERY
    query vector in one pass — the online-retrieval shape (a request
    batch against the corpus), vs `cosine_topk`'s single literal
    vector.

    The query batch broadcasts (it is bounded by construction — a
    serving batch, not a second corpus) and ONE corpus scan computes
    all |corpus|×|batch| similarities row-locally; per-query top-k
    rides `topk_per_group` with a (sim, id) tiebreak. For corpus-scale
    query sets use `cosine_pairs_blocked` (blocked matmul) or the IVF
    path instead — this operator's contract is |batch| ≪ |corpus|.

    Returns (query_id, id, sim) with exactly k rows per query
    (fewer if the corpus is smaller).
    """
    from redskins_rule_spark.operators.analytic import topk_per_group

    qv = query_vec_col or vec_col
    q = queries.select(
        F.col(query_id_col), F.col(qv).alias("_qv")
    )
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(q))
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col(vec_col), F.col("_qv")), round_dp).alias("sim"),
        )
    )
    return topk_per_group(
        scored,
        [query_id_col],
        [F.col("sim").desc(), F.col(id_col)],
        k=k,
        method="row_number",
    )


def ivf_topk_batch(
    corpus: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str = "query_id",
    query_vec_col: str | None = None,
    k: int = 10,
    nprobe: int = 2,
    cell_col: str | None = None,
    round_dp: int = 4,
) -> DataFrame:
    """IVF-pruned BATCH serving: every query probes only its `nprobe`
    nearest cells, so the batch join touches Σ_q (probed cells' rows)
    instead of |corpus|×|batch| — the scale path `cosine_topk_batch`
    trades away.

    Probe assignment is row-local on the (broadcast) query batch using
    the same literal-centroid expression as the corpus side; the
    corpus joins on the EQUI cell key (partition-pruned when the table
    is written partitioned by cell), then exact cosine + per-query
    top-k. Probing all cells reproduces the exact result — the same
    losslessness contract the single-query ivf_topk pins.
    """
    from redskins_rule_spark.operators.analytic import topk_per_group

    qv = query_vec_col or vec_col
    ncell = len(centroids)
    nprobe = min(nprobe, ncell)
    sims = F.array(*[
        F.struct(
            F.round(
                # one parsed array literal per centroid (srp/IVF lesson)
                cosine(
                    F.col("_qv"),
                    F.expr(
                        "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"
                    ),
                ),
                6,
            ).alias("s"),
            F.lit(i).alias("i"),
        )
        for i, c in enumerate(centroids)
    ])
    probes = F.slice(F.reverse(F.array_sort(sims)), 1, nprobe)
    q = (
        queries.select(F.col(query_id_col), F.col(qv).alias("_qv"))
        .withColumn("cell", F.explode(F.transform(probes, lambda x: x["i"])))
    )
    if cell_col is None:
        corpus = assign_ivf_cells(corpus, centroids, vec_col, out="cell")
        cell_col = "cell"
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col), F.col(cell_col).alias("cell"))
        .join(F.broadcast(q), "cell")
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col(vec_col), F.col("_qv")), round_dp).alias("sim"),
        )
    )
    return topk_per_group(
        scored,
        [query_id_col],
        [F.col("sim").desc(), F.col(id_col)],
        k=k,
        method="row_number",
    )


def recall_at_k(exact: DataFrame, approx: DataFrame, query_col: str, id_col: str) -> DataFrame:
    """Per-query recall of an approximate top-k result against the
    exact one: |approx ∩ exact| / |exact|. The eval harness for ANN
    tuning (nprobe / nbits / band sweeps) — both inputs are k-bounded
    per query by construction, so the semi join + agg is cheap at any
    corpus size."""
    e = exact.select(F.col(query_col).alias("__q"), F.col(id_col).alias("__i"))
    a = approx.select(F.col(query_col).alias("__q"), F.col(id_col).alias("__i"))
    hit = e.join(a, ["__q", "__i"], "left_semi").groupBy("__q").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    base = e.groupBy("__q").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        base.join(hit, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.col("n_exact"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)) / F.col("n_exact"), 4
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# Sign-random-projection (SRP) LSH — the LSH-bucketed candidate path
# for embedding near-dup / ANN, complementing IVF (cell partitioning)
# and PQ (compressed scoring). Hyperplane LSH: bit j of a vector's
# signature is sign(v · w_j); vectors with cosine s collide on one
# bit with probability 1 - θ(s)/π, so banding the bits gives the
# standard LSH recall curve with candidate generation that is ONE
# shuffle on (band, band_key) posting lists — never all-pairs.
# ---------------------------------------------------------------------------


def srp_plane_weight(j: int, i: int, dim: int, seed: int = 0) -> int:
    """Component i of hyperplane j: small deterministic integer in
    [-8, 8] from the suite's LCG scramble family — reproducible by
    integer arithmetic in ANY engine (the SQL oracle recomputes it
    inline), which is what makes SRP signatures cross-engine
    hash-checkable where float RNG planes would not be."""
    return ((1103515245 * (j * dim + i + seed) + 12345) % 2147483647) % 17 - 8


def srp_signature_bits(
    vec: Column, n_planes: int, dim: int, seed: int = 0
) -> Column:
    """Array of n_planes booleans: bit j = (v · w_j) >= 0. Each dot
    is an ORDERED left fold (zip_with + aggregate), so both engines
    sum the same doubles in the same order and near-zero dots land on
    the same side of the threshold.

    The plane matrix is ONE literal array-of-arrays rendered as a
    single SQL string — NOT n_planes·dim `F.lit` calls: the
    per-element formulation cost ~6 s of py4j round-trips PER QUERY
    CONSTRUCTION at 128×64 (the q184 driver-side wall, SURVEY
    §11.89/§11.90), where one parsed string builds in ~0.4 s. (The
    tempting third shape — generating weights in-engine via
    transform(sequence...) — is WORSE: higher-order functions are
    interpreted and not constant-folded, so 8k weights re-derive per
    ROW, ~7 s at 20k rows.) The doubles are identical either way, so
    signatures — and every differential hash built on them — are
    bit-unchanged."""
    v = vec.cast("array<double>")
    rows = ",".join(
        "array(" + ",".join(
            f"{float(srp_plane_weight(j, i, dim, seed))}D"
            for i in range(dim)
        ) + ")"
        for j in range(n_planes)
    )
    planes = F.expr(f"array({rows})")
    return F.transform(
        planes,
        lambda w: F.aggregate(
            F.zip_with(v, w, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        >= 0,
    )


def srp_auto_band_bits(
    n: int, bands: int = 8, candidate_budget: int | None = 64_000_000
) -> int:
    """Bits per band (r) that auto-banding (`srp_lsh_pairs` with
    n_planes=None) resolves for a corpus of n vectors — the named
    formula, so oracles and tests couple to THE code path rather than
    re-deriving it (ADVICE r7: q185's oracle hardcodes 64 planes; this
    function is what pins where that stays valid).

    r is the smallest band width (>= 8 bits) whose expected random
    collision volume bands·n²/2^(r+1) fits the cost target 16n —
    LINEAR in n, so verify-join work tracks the true-pair count at
    every corpus size (VERDICT r7 item 3: the old max(1M, 16n) floor
    made small corpora pay a 1M-collision verify join — at sf0.1's
    2k vectors that was 31 random candidates per vector where 16
    suffice, and at sf1's 20k it held r at 11 when 13 is free).
    Resolved values: r=8 for n <= 1024 (the oracle SFs' 500-vector
    corpora and any smaller fixture), r=9 at 2k (sf0.1 bench), r=13
    at 20k (sf1), r=16 at 200k — the EXACT configuration the x100
    probe measured, so the sf10 story is unchanged by the taper."""
    target = 16 * n
    if candidate_budget is not None:
        target = min(target, candidate_budget)
    return max(
        8,
        math.ceil(math.log2(max(1.0, bands * n * n / (2.0 * target)))),
    )


def srp_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int | None = 64,
    bands: int = 8,
    threshold: float = 0.4,
    seed: int = 0,
    round_dp: int = 4,
    max_postings: int | None = None,
    candidate_budget: int | None = 64_000_000,
) -> DataFrame:
    """Embedding near-dup pairs via SRP-LSH banding + exact cosine
    verify: (id_a, id_b, cos_sim) for candidate pairs colliding on
    ANY band whose verified cosine >= threshold.

    BANDING MUST SCALE WITH n (checked contract, found by the x100
    probe): random band collisions alone produce ~bands·n²/2^(r+1)
    candidate pairs (r = n_planes/bands bits per band key), QUADRATIC
    in n whenever 2^r stops dominating n — 8-bit bands that are fine
    at 20k vectors OOM the shuffle at 200k (625M random pairs).
    Unless `max_postings` bounds every bucket (which caps pairs at
    bands·2^r·cap²/2 independent of n), the operator raises when the
    expected random-collision volume exceeds `candidate_budget`,
    telling the caller the minimum n_planes — the same guard-in-code
    policy as `_resolve_num_blocks`. The estimate costs one metadata
    count().

    Scale shape: signatures are expression-only (no Python), band
    keys explode to `bands` rows per vector, candidates come from
    `pairs_from_posting_lists` as ID PAIRS ONLY — carrying the
    vectors through the pair explosion would materialize
    |candidates|·dim·8 bytes in the posting lists (an OOM at 50k
    vectors / 39M candidates); instead the verify step joins the
    candidate ids against the BROADCAST vector table twice and
    computes the cosine in-flight (map-side, nothing wide ever
    shuffles). When the vector table outgrows a broadcast, swap the
    probe for a bucketed equi-join on id — the candidate set stays
    id-grain either way. `max_postings` caps hot buckets exactly
    like the text-LSH family. Versus `cosine_pairs_blocked` (exact,
    O(n²/B) compute) this is the sub-quadratic candidate path —
    recall follows the banding curve 1-(1-(1-θ/π)^r)^b rather than
    being exact.
    """
    auto_sized = n_planes is None
    if auto_sized:
        # AUTO-BANDING (VERDICT r6, tapered r7 item 3): the banding
        # guard below tells the caller the minimum bits/band when n
        # outgrows the budget — auto mode APPLIES that formula
        # instead of raising, via `srp_auto_band_bits`: r is the
        # smallest band width (>= 8 bits) whose expected random
        # collision volume bands·n²/2^(r+1) fits the 16n cost target,
        # so ONE registered query runs unchanged from 500 vectors to
        # the x100 probe's 200k (r widens 8 -> 16 there, the exact
        # configuration the probe measured at 6.6x wall for 100x
        # data). The target is O(n) — NOT candidate_budget: the
        # budget is the don't-OOM ceiling, and sizing to it merely
        # avoids the crash while still shipping tens of millions of
        # junk pairs into the verify join (the first q185 sf10 probe
        # timed out exactly there, 39M pairs at r=12 under the 64M
        # budget); and NOT the old max(1M, 16n) floor, whose fixed 1M
        # collisions made SMALL corpora do 30-500x the verify work
        # their true-pair volume justifies. Deterministic in n; one
        # metadata count(); the guard below is then satisfied by
        # construction (target <= budget in any sane config).
        n = df.count()
        r = srp_auto_band_bits(n, bands, candidate_budget)
        n_planes = bands * r
    if n_planes % bands:
        raise ValueError("bands must divide n_planes")
    r = n_planes // bands
    if not auto_sized and candidate_budget is not None and max_postings is None:
        n = df.count()
        expected = bands * n * n / float(1 << (r + 1))
        if expected > candidate_budget:
            r_min = max(
                r,
                math.ceil(math.log2(bands * n * n / (2.0 * candidate_budget))),
            )
            raise ValueError(
                f"srp_lsh_pairs: ~{expected:,.0f} expected random band "
                f"collisions at n={n:,} with {r}-bit band keys exceeds "
                f"candidate_budget={candidate_budget:,} — the candidate "
                f"volume is quadratic in n once 2^r stops dominating it. "
                f"Use n_planes>={bands * r_min} (>= {r_min} bits/band), or "
                f"cap buckets with max_postings, or raise/disable "
                f"candidate_budget"
            )
    from redskins_rule_spark.operators.dedup import pairs_from_posting_lists

    # materialize the signature ONCE per row (its 64 ordered dot folds
    # are the expensive part) before fanning out to band rows — the
    # generator expression would otherwise re-evaluate it per band
    with_bits = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
        srp_signature_bits(F.col(vec_col), n_planes, dim, seed).alias(
            "__bits"
        ),
    )
    bits = F.col("__bits")
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                sum(
                    (
                        F.when(
                            F.element_at(bits, b * r + t + 1), F.lit(1 << t)
                        ).otherwise(F.lit(0))
                        for t in range(r)
                    ),
                    F.lit(0),
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    exploded = with_bits.select(
        F.col(id_col),
        "__v",
        F.explode(band_structs).alias("bb"),
    ).select(
        id_col, "__v",
        F.col("bb.band").alias("band"),
        F.col("bb.band_key").alias("band_key"),
    )
    cands = pairs_from_posting_lists(
        exploded.drop("__v"), ["band", "band_key"], id_col,
        max_postings=max_postings,
    ).dropDuplicates(["id_a", "id_b"])
    vecs = df.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).cast("array<double>").alias("__vec"),
    )
    enriched = (
        cands.join(
            F.broadcast(vecs.withColumnRenamed("__vec", "__va")),
            F.col("id_a") == F.col("__vid"),
        )
        .drop("__vid")
        .join(
            F.broadcast(vecs.withColumnRenamed("__vec", "__vb")),
            F.col("id_b") == F.col("__vid"),
        )
        .drop("__vid")
    )
    # VERIFY IS VECTORIZED (round 8): the candidate volume is the
    # whole point of this operator's cost model (target ~16n random
    # collisions + true pairs), and evaluating an interpreted
    # zip_with/aggregate fold per pair priced each candidate at
    # 10-100x its numpy cost — the same per-pair-expression tax the
    # SemDeDup router removed. One Arrow batch pass computes all
    # cosines with row-wise einsum (sequential per-element
    # accumulation, the left-fold order); rounding and the threshold
    # stay Spark-side, so oracle semantics are unchanged (the q22
    # numpy-double -> F.round precedent).
    id_type = df.schema[id_col].dataType.simpleString()

    def batch_cosine(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            va = np.array([np.asarray(v) for v in pdf["__va"]], dtype=np.float64)
            vb = np.array([np.asarray(v) for v in pdf["__vb"]], dtype=np.float64)
            dot = np.einsum("ij,ij->i", va, vb)
            na = np.sqrt(np.einsum("ij,ij->i", va, va))
            nb = np.sqrt(np.einsum("ij,ij->i", vb, vb))
            d = na * nb
            sim = np.where(d == 0, 0.0, dot / np.where(d == 0, 1.0, d))
            yield pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "cos_sim": sim}
            )

    raw = enriched.mapInPandas(
        batch_cosine,
        schema=f"id_a {id_type}, id_b {id_type}, cos_sim double",
    )
    return (
        raw.select(
            "id_a", "id_b", F.round("cos_sim", round_dp).alias("cos_sim")
        )
        .where(F.col("cos_sim") >= threshold)
    )


def topk_from_pairs(pairs: DataFrame, k: int) -> DataFrame:
    """Directed per-id top-k from an UNDIRECTED similarity pair frame
    (id_a, id_b, cos_sim) — the adapter that lets any pair emitter
    (`srp_lsh_pairs`, `cosine_pairs_blocked`, a bucketed MinHash join)
    feed the k-NN vote stages: symmetrize each pair into both
    directions, then keep each id's top-k under the SAME total order
    the exact path selects by — (cos_sim desc, neighbor id asc), a
    KEYED window (never a global sort). Ids with no surviving pair
    simply don't appear, exactly like the exact path's min_sim
    cutoff."""
    sym = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nb"), "cos_sim"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("id"), F.col("id_a").alias("nb"), "cos_sim"
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("cos_sim").desc(), F.col("nb").asc()
    )
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def knn_label_consistency(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
    round_dp: int = 4,
    num_blocks: int = 16,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Label-noise screening by k-NN vote — the confident-learning-
    style curation pass: a row whose own label disagrees with the
    majority label of its k nearest neighbors (cosine) is a mislabel
    candidate. Output: (id, label, knn_label, n_agree, is_suspect).

    Pipeline: exact blocked k-NN candidates
    (`knn_candidates_blocked`: each block-pair task emits only
    per-row top-k under the final total order, so candidate volume
    is n*k*B — NOT the n^2/2 symmetric pair list), then the global
    per-id top-k window (keyed, never global), then majority vote
    with (count desc, label asc) tie pinning. Neighbors restricted
    to cosine >= 0 (every point in a non-degenerate corpus has far
    more than k such neighbors).

    Scale (VERDICT r6 item 1, now CODE not prose): the exact source
    is n²-FLOP by definition — pass `candidates`, an UNDIRECTED pair
    frame (id_a, id_b, cos_sim) from a sub-quadratic emitter
    (`srp_lsh_pairs` auto-banded, IVF cell pairs, ...), and the vote
    stages run unchanged on `topk_from_pairs`' per-id top-k of it.
    With an all-pairs candidate frame the two paths are provably
    identical (pytest-pinned); with an LSH frame the neighbor set
    follows the banding recall curve and ids with no surviving
    candidate are absent (same contract as min_sim). The exact path
    stays as the verification baseline.
    """
    labels = df.select(
        F.col(id_col).alias("nb"), F.col(label_col).alias("nb_label")
    )
    if candidates is None:
        cand = knn_candidates_blocked(
            df, id_col, vec_col, k=k, num_blocks=num_blocks,
            round_dp=round_dp, min_sim=0.0,
        )
    else:
        cand = topk_from_pairs(candidates, k)
    topk = cand.join(labels, "nb")
    votes = topk.groupBy("id", "nb_label").agg(
        F.count(F.lit(1)).alias("n")
    )
    wv = Window.partitionBy("id").orderBy(
        F.col("n").desc(), F.col("nb_label").asc()
    )
    winner = (
        votes.withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
        .select("id", F.col("nb_label").alias("knn_label"),
                F.col("n").alias("n_agree"))
    )
    own = df.select(F.col(id_col).alias("id"), F.col(label_col).alias("label"))
    return own.join(winner, "id").select(
        "id", "label", "knn_label", "n_agree",
        (F.col("label") != F.col("knn_label")).alias("is_suspect"),
    )


def _round_half_up_like_sql(sim, dp: int):
    """Round a float64 ndarray exactly as Spark's F.round (and
    DuckDB's round) does — BigDecimal HALF_UP on the double's
    SHORTEST DECIMAL representation (Java's Double.toString and
    Python's repr both emit the unique shortest round-trip decimal,
    so `Decimal(repr(x))` reproduces BigDecimal.valueOf(x)).

    The numpy fast path floor(x*10^dp + 0.5) rounds the BINARY
    product, which can disagree with the decimal rounding when the
    scaled fraction sits essentially on .5 (multiplication error ~
    1e-12 there, and HALF_UP is away-from-zero for negatives while
    floor(+0.5) is toward +inf) — exactly the cross-block ties the
    exact-kNN selection contract depends on (ADVICE r5). Elements
    within 1e-9 of the boundary take the decimal slow path; for
    continuous similarity data that is a vanishing fraction, so the
    fast path dominates."""
    import numpy as np

    scale = 10.0 ** dp
    scaled = sim * scale
    r = np.floor(scaled + 0.5) / scale
    frac = scaled - np.floor(scaled)
    suspect = np.abs(frac - 0.5) < 1e-9
    if suspect.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal(1).scaleb(-dp)
        flat, sflat = r.reshape(-1), sim.reshape(-1)
        for i in np.nonzero(suspect.reshape(-1))[0]:
            flat[i] = float(
                Decimal(repr(float(sflat[i]))).quantize(
                    q, rounding=ROUND_HALF_UP
                )
            )
    return r


def knn_candidates_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    num_blocks: int | None = 16,
    round_dp: int = 4,
    min_sim: float = 0.0,
    block_bytes: int = 64 << 20,
    validate: bool = True,
) -> DataFrame:
    """DIRECTED k-NN candidates (id, nb, cos_sim) with per-block
    top-k selection — the scale-correct exact-kNN layout: the naive
    symmetrized pair list is O(n²) ROWS (312M at 50k vectors with
    min_sim=0), which drowns the downstream shuffle even though the
    matmul itself is cheap. Instead each of the O(B²) block-pair
    tasks emits only each row's local top-k, so the global candidate
    volume is n·k·B — linear in n.

    EXACTNESS: block-local selection uses the IDENTICAL total order
    the consumer ranks by — (cosine ROUNDED to round_dp desc,
    neighbor id asc) — so every global top-k row is inside its
    block's top-k (restricting a total order to a subset can only
    improve a row's rank). The selection key is rounded with
    `_round_half_up_like_sql`, the SAME decimal HALF_UP semantics as
    the downstream F.round — a binary-only rounding could drop a
    boundary-tied true top-k row inside its block. Neighbors below
    `min_sim` (post-rounding) are excluded by contract.

    BLOCK SIZING (VERDICT r5): shared `_resolve_num_blocks` byte
    budget — num_blocks=None derives B from ceil(n·row_bytes /
    block_bytes) (default 64 MB per block); over-budget sizings raise
    with the minimum feasible count.
    """
    num_blocks, _ = _resolve_num_blocks(
        df, vec_col, num_blocks, block_bytes, "knn_candidates_blocked",
        validate=validate,
    )
    packed = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("blk", F.pmod(F.hash("id"), F.lit(num_blocks)))
        .groupBy("blk")
        .agg(F.collect_list(F.struct("id", "v")).alias("items"))
    )
    pairs = (
        packed.alias("a")
        .join(packed.alias("b"), F.col("a.blk") <= F.col("b.blk"))
        .select(
            F.col("a.blk").alias("blk_a"),
            F.col("b.blk").alias("blk_b"),
            F.col("a.items").alias("items_a"),
            F.col("b.items").alias("items_b"),
        )
    )
    id_type = df.schema[id_col].dataType.simpleString()

    def block_topk(batches):
        import numpy as np
        import pandas as pd

        def unit(items):
            ids = np.array([x["id"] for x in items])
            v = np.array(
                [np.asarray(x["v"]) for x in items], dtype=np.float64
            )
            n = np.linalg.norm(v, axis=1, keepdims=True)
            n[n == 0] = 1.0
            return ids, v / n

        def emit(ids_q, uq, ids_c, uc, out):
            # per-query top-k under (rounded sim desc, candidate asc);
            # rounding here is for SELECTION only — the emitted value
            # is the raw double, rounded downstream by F.round so the
            # value path is identical to cosine_pairs_blocked's
            # (numpy double -> Spark round, the precedent the q22
            # oracle family already hash-matches). The selection key
            # uses F.round's OWN decimal HALF_UP semantics so a
            # boundary-tied row can't be dropped block-locally.
            # Query rows are CHUNKED so the sim slab stays bounded
            # (_SIM_SLAB_BYTES) no matter the block size — per-row
            # results are independent, so chunking is value-invisible.
            chunk = max(1, _SIM_SLAB_BYTES // (8 * max(1, len(ids_c))))
            for q0 in range(0, len(ids_q), chunk):
                sim = uq[q0: q0 + chunk] @ uc.T
                r = _round_half_up_like_sql(sim, round_dp)
                for qi in range(r.shape[0]):
                    row = r[qi]
                    mask = row >= min_sim
                    mask &= ids_c != ids_q[q0 + qi]
                    idx = np.nonzero(mask)[0]
                    if idx.size == 0:
                        continue
                    order = np.lexsort((ids_c[idx], -row[idx]))[:k]
                    for j in idx[order]:
                        out.append((ids_q[q0 + qi], ids_c[j], sim[qi, j]))

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                ia, ua = unit(row["items_a"])
                ib, ub = unit(row["items_b"])
                emit(ia, ua, ib, ub, out)
                if row["blk_a"] != row["blk_b"]:
                    # reverse direction for cross-block pairs (second
                    # chunked pass; re-doing the matmul beats holding
                    # the full transposed slab)
                    emit(ib, ub, ia, ua, out)
            if out:
                yield pd.DataFrame(
                    out, columns=["id", "nb", "cos_sim"]
                )

    cands = pairs.mapInPandas(
        block_topk,
        schema=f"id {id_type}, nb {id_type}, cos_sim double",
    ).select("id", "nb", F.round("cos_sim", round_dp).alias("cos_sim"))
    w = Window.partitionBy("id").orderBy(
        F.col("cos_sim").desc(), F.col("nb").asc()
    )
    return (
        cands.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def axis_cell(vec: Column, n_cells: int) -> Column:
    """Deterministic cluster assignment against FIXED axis-aligned
    centroids (the unit basis vectors e_0..e_{n_cells-1}): cell =
    argmax_i v[i]/‖v‖, exact ties to the HIGHER index — the same
    pinned rule q30's IVF oracle uses, so any SQL engine reproduces
    the partition bit-for-bit. Stands in for trained k-means cells
    wherever the differential needs a replayable clustering; swap in
    `train_ivf_centroids` + `ivf_assign` when determinism can be
    engine-local."""
    v = vec.cast("array<double>")
    n = norm(v)
    scores = [F.round(v[i] / n, 6) for i in range(n_cells)]
    best = F.greatest(*scores)
    expr = F.lit(0)
    for i in range(n_cells):  # ascending: later (higher) index wins ties
        expr = F.when(scores[i] == best, F.lit(i)).otherwise(expr)
    return expr


def semdedup_survivors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 4,
    threshold: float = 0.97,
    round_dp: int = 4,
    max_cell_rows: int = 200_000,
    max_cell_pairs: int = 500_000_000,
    strategy: str = "blocked",
    block_bytes: int = 64 << 20,
    block_target_rows: int = 8192,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public method):
    semantic dedup of an embedding corpus by clustering, then removing
    all-but-one of each near-identical group WITHIN a cluster — the
    pairwise search never crosses cluster boundaries, which is the
    method's whole scale point.

    Survivor rule (pinned): id x dies iff some SMALLER id in its cell
    has ROUND(cos, round_dp) ≥ threshold. Deterministic and
    SQL-replayable; diverges from the paper's greedy-ball sweep only
    on chains (a~b, b~c, a≁c kills both b and c — the standard
    order-greedy approximation).

    Output: (id_col, cell, survived) for every input row. Null
    vectors are never compared (both strategies): they survive, with
    the default cell 0 — the documented null policy (ADVICE r8).

    Strategies (VERDICT r7 item 1 — route, don't just raise):

    - 'blocked' (default): within-cell pairs via the co-partitioned
      block-matmul layout (`_cosine_pairs_copartitioned` grouped by
      cell) — each (cell, block-pair) task computes ONE vectorized
      numpy matmul over two bounded blocks, `_SIM_SLAB_BYTES`-chunked,
      so memory is O(block) regardless of cell size and a hot cell
      costs FLOPs, not an interpreted-expression wall. This is the
      path that RUNS the sf10 configuration (6.5e9 within-cell pairs)
      the old guard could only refuse; the pair budgets below are not
      consulted — quadratic-in-cell FLOPs are inherent to SemDeDup's
      within-cell semantics and `n_cells` is the knob that bounds
      them. Block count auto-sizes per the largest cell: the
      `block_bytes` byte budget ∧ `block_target_rows` rows (the
      second term keeps B·(B+1)/2 tasks per cell wide enough to fill
      executors when one cell dominates).
    - 'expression': the original within-cell equi-join evaluating an
      interpreted per-pair cosine — ~10-100× the per-pair cost of the
      matmul, kept as the cross-check face (pytest pins blocked ≡
      expression) and for tiny corpora where spinning Python workers
      isn't worth it. Guarded by `max_cell_rows` / `max_cell_pairs`
      (the §11.61/§11.63 checked-contract pattern): one n_cells-row
      aggregate up front, raise with corrective n_cells before the
      wall-clock dies.
    """
    if strategy not in ("blocked", "expression"):
        raise ValueError("strategy must be 'blocked' or 'expression'")
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).withColumn("cell", axis_cell(F.col("__v"), n_cells))
    if strategy == "blocked":
        killed = _semdedup_killed_blocked(
            base, id_col, threshold, round_dp, block_bytes,
            block_target_rows,
        )
    else:
        sizes = (
            base.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        hot = [r for r in sizes if r.n > max_cell_rows]  # ≤ n_cells rows
        total_pairs = sum(r.n * (r.n - 1) // 2 for r in sizes)
        if hot or total_pairs > max_cell_pairs:
            worst = max(r.n for r in sizes) if sizes else 0
            need = max(len(sizes), 1)
            while True:
                # uniform-split estimate of the cell count that fits
                # the budget
                est = need * ((worst * len(sizes) // need) ** 2) // 2
                if est <= max_cell_pairs or need > 1 << 20:
                    break
                need *= 2
            raise ValueError(
                f"semdedup: cell budget exceeded (largest cell {worst} "
                f"rows"
                f"{' > max_cell_rows=' + str(max_cell_rows) if hot else ''}; "
                f"{total_pairs} within-cell pairs vs max_cell_pairs="
                f"{max_cell_pairs}); raise n_cells to ~{need}, raise the "
                "budget, or use strategy='blocked' (per-cell block "
                "matmul — the default)"
            )
        a = base.select(
            "cell", F.col(id_col).alias("__ida"), F.col("__v").alias("__va")
        )
        b = base.select(
            "cell", F.col(id_col).alias("__idb"), F.col("__v").alias("__vb")
        )
        killed = (
            a.join(b, "cell")
            .where(F.col("__ida") < F.col("__idb"))
            .where(
                F.round(cosine(F.col("__va"), F.col("__vb")), round_dp)
                >= F.lit(threshold)
            )
            .select(F.col("__idb").alias(id_col))
            .distinct()
        )
    return base.join(
        killed.withColumn("__dead", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        "cell",
        F.coalesce(~F.col("__dead"), F.lit(True)).alias("survived"),
    )


def _semdedup_killed_blocked(
    base: DataFrame,
    id_col: str,
    threshold: float,
    round_dp: int,
    block_bytes: int,
    block_target_rows: int,
) -> DataFrame:
    """Dead-id frame of the blocked SemDeDup strategy: within-cell
    pairs with ROUND(cos, dp) ≥ threshold from the cell-grouped
    co-partitioned matmul layout; the LARGER id of each surviving
    pair is dead (some smaller id covers it). One n_cells-row + one
    one-row aggregate of sizing metadata; nothing corpus-sized ever
    reaches the driver. Value path matches the expression strategy:
    numpy double → Spark-side F.round → threshold (the q22 precedent
    the oracle family hash-matches)."""
    # Null policy (ADVICE r8): a null vector can neither kill nor die
    # — the expression strategy gets this for free (null cosine fails
    # the threshold filter); here the matmul kernel would die on
    # np.asarray(None), so nulls are filtered before the layout and
    # their rows surface as survived=True like every uncompared row.
    nn = base.where(F.col("__v").isNotNull())
    sizes = nn.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    if not sizes:
        return base.sparkSession.createDataFrame(
            [], base.select(id_col).schema
        )
    n_max = max(r.n for r in sizes)
    # dim from ONE non-null row (the _resolve_num_blocks doctrine:
    # sizing must not pre-scan the vector column)
    head = nn.select(F.size("__v").alias("dim")).first()
    dim = (head["dim"] if head is not None else 0) or 0
    per_row = dim * 8 + 48
    num_blocks = max(
        1,
        math.ceil(n_max * per_row / block_bytes),
        math.ceil(n_max / max(1, block_target_rows)),
    )
    margin = threshold - 0.5 * 10.0 ** (-round_dp)
    id_type = base.schema[id_col].dataType.simpleString()
    raw = _cosine_pairs_copartitioned(
        nn, id_col, "__v", num_blocks, margin, id_type,
        group_cols=("cell",),
    )
    pairs = _orient_round_filter(raw, threshold, round_dp)
    return pairs.select(F.col("id_b").alias(id_col)).distinct()
