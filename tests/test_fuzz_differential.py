"""Randomized cross-engine differential fuzzing.

The driver differential runs on FIXED testdata; these tests generate
fresh random tables per seed (nulls in keys and values, duplicate
keys, skewed groups, negative values) and demand Spark == DuckDB on
them for a sample of core shapes: grouped aggregation, windowed
top-k with ties, distinct dedup, and the as-of join operator. Money
flows as exact cents so float summation order can't blur the
comparison; as-of carries values through unchanged (no arithmetic),
so doubles compare exactly.

Seeds are fixed (reproducible failures) but the DATA is arbitrary —
a cross-engine disagreement on any layout is a real semantics bug,
the class the fixed-data differential can't explore.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SEEDS = [3, 11, 42]


def _rand_orders(rng: np.random.Generator, n: int = 200) -> pd.DataFrame:
    grp = rng.choice(["a", "b", "c", None], n, p=[0.4, 0.3, 0.2, 0.1])
    v = np.round(rng.normal(100.0, 75.0, n), 2)  # negatives included
    v[rng.random(n) < 0.07] = np.nan
    return pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 15, n).astype(np.int64),
            "grp": grp,
            "v": v,
        }
    )


def _spark_df(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None),
                                 "id long, k long, grp string, v double")


def _rows(df) -> list[tuple]:
    def norm(x):
        if x is None:
            return None
        if isinstance(x, float):
            return round(x, 6)
        return x

    return sorted((tuple(norm(v) for v in r) for r in df), key=repr)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_grouped_agg(spark, seed):
    rng = np.random.default_rng(seed)
    pdf = _rand_orders(rng)
    sdf = _spark_df(spark, pdf)
    got = _rows(
        sdf.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("v") * 100).cast("long")).alias("cents"),
            F.count("v").alias("n_v"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = _rows(
        con.sql(
            """
            SELECT grp, COUNT(*) AS n,
                   SUM(CAST(ROUND(v * 100) AS BIGINT)) AS cents,
                   COUNT(v) AS n_v
            FROM t GROUP BY grp
            """
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_windowed_topk(spark, seed):
    rng = np.random.default_rng(seed)
    pdf = _rand_orders(rng)
    # inject exact ties so the tiebreak path is exercised every seed
    pdf.loc[: len(pdf) // 4, "v"] = 50.0
    sdf = _spark_df(spark, pdf)
    cents = F.round(F.col("v") * 100).cast("long")
    w = Window.partitionBy("grp").orderBy(
        F.col("cents").desc_nulls_last(), F.col("id")
    )
    got = _rows(
        sdf.withColumn("cents", cents)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("grp", "id", "rn")
        .collect()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = _rows(
        con.sql(
            """
            SELECT grp, id, rn FROM (
              SELECT grp, id,
                     ROW_NUMBER() OVER (
                       PARTITION BY grp
                       ORDER BY CAST(ROUND(v * 100) AS BIGINT)
                                DESC NULLS LAST, id) AS rn
              FROM t) WHERE rn <= 3
            """
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_distinct(spark, seed):
    rng = np.random.default_rng(seed)
    pdf = _rand_orders(rng)
    sdf = _spark_df(spark, pdf)
    got = _rows(sdf.select("k", "grp").distinct().collect())
    con = duckdb.connect()
    con.register("t", pdf)
    want = _rows(con.sql("SELECT DISTINCT k, grp FROM t").fetchall())
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_asof_join(spark, seed):
    """The as-of operator vs DuckDB's ASOF JOIN on random (key, time)
    layouts with duplicate times (pinned by the tiebreak) and keys
    that match nothing."""
    from redskins_rule_spark.operators.asof import asof_join

    rng = np.random.default_rng(seed)
    n_l, n_r = 120, 80
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_l).astype(np.int64),
            "t": rng.integers(0, 500, n_l).astype(np.int64),
            "lid": np.arange(n_l, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 10, n_r).astype(np.int64),
            "rt": rng.integers(0, 500, n_r).astype(np.int64),
            "price": np.round(rng.random(n_r) * 100, 2),
        }
    )
    # duplicate right times per key would make "the" match ambiguous —
    # dedup to one row per (k, rt) so both engines chase one target
    right = (
        right.sort_values(["k", "rt", "price"])
        .groupby(["k", "rt"], as_index=False)
        .last()
    )
    sl = spark.createDataFrame(left, "k long, t long, lid long")
    sr = spark.createDataFrame(right, "k long, rt long, price double")
    out = asof_join(
        sl, sr, "t", "rt", by=["k"], tolerance=100, unit="seconds",
        direction="backward", left_keys=["lid"],
    ).select("lid", "price")
    got = _rows(out.collect())
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = _rows(
        con.sql(
            """
            SELECT l.lid,
                   (SELECT r.price FROM r
                    WHERE r.k = l.k AND r.rt <= l.t
                      AND l.t - r.rt <= 100
                    ORDER BY r.rt DESC LIMIT 1) AS price
            FROM l
            """
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_rollup_with_null_groups(spark, seed):
    """ROLLUP where a grouping column contains REAL NULLs — the
    classic ambiguity (is a NULL row a subtotal or a data group?).
    GROUPING() must disambiguate identically in both engines."""
    rng = np.random.default_rng(seed)
    pdf = _rand_orders(rng)
    sdf = _spark_df(spark, pdf)
    got = _rows(
        sdf.rollup("grp")
        .agg(
            F.grouping("grp").cast("int").alias("is_total"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("v") * 100).cast("long")).alias("cents"),
        )
        .select("grp", "is_total", "n", "cents")
        .collect()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = _rows(
        con.sql(
            """
            SELECT grp, CAST(GROUPING(grp) AS INTEGER) AS is_total,
                   COUNT(*) AS n,
                   SUM(CAST(ROUND(v * 100) AS BIGINT)) AS cents
            FROM t GROUP BY ROLLUP (grp)
            """
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_forward_fill(spark, seed):
    """The forward-fill operator vs DuckDB's IGNORE NULLS last_value
    on random null layouts (leading nulls stay null, runs of nulls
    carry the last observation)."""
    from redskins_rule_spark.operators.analytic import forward_fill

    rng = np.random.default_rng(seed)
    pdf = _rand_orders(rng)
    sdf = _spark_df(spark, pdf)
    out = forward_fill(
        sdf, "v", order_by=["id"], partition_by=["k"], out="ff"
    ).select("id", "ff")
    got = _rows(out.collect())
    con = duckdb.connect()
    con.register("t", pdf)
    want = _rows(
        con.sql(
            """
            SELECT id,
                   last_value(v IGNORE NULLS) OVER (
                     PARTITION BY k ORDER BY id
                     ROWS UNBOUNDED PRECEDING) AS ff
            FROM t
            """
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_exact_percentiles(spark, seed):
    """Exact interpolated percentiles (Spark percentile vs DuckDB
    quantile_cont) on random values incl. duplicates — interpolation
    conventions must agree at 6dp on every layout."""
    rng = np.random.default_rng(seed)
    pdf = _rand_orders(rng)
    pdf["v"] = np.round(rng.normal(0, 10, len(pdf)), 2)  # no nulls here
    pdf.loc[: len(pdf) // 5, "v"] = 7.0  # duplicate mass
    sdf = _spark_df(spark, pdf)
    got = _rows(
        sdf.groupBy("k")
        .agg(
            F.round(F.percentile("v", F.lit(0.25)), 6).alias("p25"),
            F.round(F.percentile("v", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("v", F.lit(0.9)), 6).alias("p90"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = _rows(
        con.sql(
            """
            SELECT k,
                   ROUND(quantile_cont(v, 0.25), 6) AS p25,
                   ROUND(quantile_cont(v, 0.5), 6) AS p50,
                   ROUND(quantile_cont(v, 0.9), 6) AS p90
            FROM t GROUP BY k
            """
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_islands(spark, seed):
    """Gaps-and-islands on random day sets with duplicates — the
    anchor (date − dense row number) trick vs DuckDB's re-derivation,
    for every random layout of runs and singletons."""
    from redskins_rule_spark.operators.analytic import islands

    rng = np.random.default_rng(seed)
    n = 150
    pdf = pd.DataFrame(
        {
            "user_id": rng.integers(0, 6, n).astype(np.int64),
            "d": [
                f"2024-{1 + int(m):02d}-{1 + int(dd):02d}"
                for m, dd in zip(
                    rng.integers(0, 3, n), rng.integers(0, 28, n)
                )
            ],
        }
    )
    sdf = spark.createDataFrame(pdf, "user_id long, d string")
    got = _rows(
        islands(sdf, ["user_id"], "d")
        .select(
            "user_id",
            F.col("island_start").cast("string"),
            F.col("island_end").cast("string"),
            "island_days",
        )
        .collect()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = _rows(
        con.sql(
            """
            WITH days AS (SELECT DISTINCT user_id, CAST(d AS DATE) AS d
                          FROM t),
            r AS (SELECT user_id, d,
                         d - CAST(ROW_NUMBER() OVER (
                               PARTITION BY user_id ORDER BY d)
                             AS INTEGER) AS anchor
                  FROM days)
            SELECT user_id,
                   CAST(MIN(d) AS VARCHAR) AS island_start,
                   CAST(MAX(d) AS VARCHAR) AS island_end,
                   COUNT(*) AS island_days
            FROM r GROUP BY user_id, anchor
            """
        ).fetchall()
    )
    assert got == want
