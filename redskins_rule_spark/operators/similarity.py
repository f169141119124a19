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

    Ties pinned by (rounded cosine desc, id asc). The global top-k
    window is fine: after the row-local cosine projection the sort key
    is tiny, and Spark executes global row_number top-k as a per-
    partition take + merge.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), round_dp).alias("cos_sim"),
    )
    w = Window.orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


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
    single (broadcast) target row."""
    target = df.where(F.col(id_col) == target_id).select(
        F.col(vec_col).cast("array<double>").alias("__qv")
    )
    scored = (
        df.where(F.col(id_col) != target_id)
        .crossJoin(F.broadcast(target))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("__qv")), round_dp).alias("cos_sim"),
        )
    )
    w = Window.orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
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
    partitioned by cell for IVF-pruned scans."""
    sims = F.array(*[
        F.struct(
            F.round(cosine(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c])), 6).alias("s"),
            F.lit(i).alias("i"),
        )
        for i, c in enumerate(centroids)
    ])
    return df.withColumn(out, F.array_max(sims)["i"])


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
