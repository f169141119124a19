"""Local mimic of the driver's correctness gate.

Runs every workload query on Spark AND its DuckDB oracle at a given
sf dir, compares row count, column names, and values STRICTLY: columns
sorted by name, rows sorted, then each scalar compared by repr — so an
int64 12345 vs float64 12345.0, or Decimal('1.10') vs 1.1, FAILS here
exactly as it fails the driver's value-hash. (Round 1 lesson: a
float-normalizing local gate passed q12/q33/q38 while the driver's
exact hash failed them.)

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(v) -> str:
    """Canonical string for one scalar, NaN/None-stable, repr-strict."""
    if v is None:
        return "<null>"
    if isinstance(v, float) and math.isnan(v):
        return "<nan>"
    try:
        if v != v:  # pandas NaT / numpy nan in object columns
            return "<nan>"
    except Exception:
        pass
    return repr(v)


def _canon_frame(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df[sorted(df.columns)]
    rows = [tuple(_canon(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(
            f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        )
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return problems
    a, b = _canon_frame(sdf), _canon_frame(odf)
    cols = sorted(sdf.columns)
    bad_by_col: dict[str, int] = {}
    examples: list[str] = []
    for ra, rb in zip(a, b):
        for c, x, y in zip(cols, ra, rb):
            if x != y:
                bad_by_col[c] = bad_by_col.get(c, 0) + 1
                if len(examples) < 3:
                    examples.append(f"{c}: spark={x} oracle={y}")
    for c, n in sorted(bad_by_col.items()):
        problems.append(f"column {c}: {n}/{len(a)} values differ")
    if examples:
        problems.append("e.g. " + " | ".join(examples))
    return problems


# In-engine checksum compare for results too big to materialize (the
# sf10 q59 case: 100M rows — toPandas + repr-canon is infeasible on
# EITHER side, and a 100 TB deployment could never collect an answer
# to verify it). Both engines compute the same order-independent
# digest: canonical row string (columns sorted by name, each coalesced
# to '<null>' and cast to string) -> md5 -> two 32-bit hex slices ->
# SUM. md5 is bit-identical across engines; the sums are
# order-independent because row order is not part of the contract.
# Only exact-text-stable dtypes participate (ints, strings, booleans,
# dates); floats/timestamps fall back to a named count-only check.
_CHECKSUM_SPARK_TYPES = {
    "tinyint", "smallint", "int", "bigint", "string", "boolean", "date"
}
_CHECKSUM_DUCK_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT", "VARCHAR",
    "BOOLEAN", "DATE",
}


def _duck_hex8(expr: str) -> str:
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )


def checksum_spark(df) -> tuple[int, int, int]:
    from pyspark.sql import functions as F

    cols = sorted(df.columns)
    rowstr = F.concat_ws(
        "|",
        *[F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in cols],
    )
    md5 = F.md5(rowstr)
    h1 = F.conv(F.substring(md5, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5, 9, 8), 16, 10).cast("long")
    row = (
        df.select(h1.alias("h1"), h2.alias("h2"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("h1").alias("s1"),
            F.sum("h2").alias("s2"),
        )
        .collect()[0]
    )
    return int(row.n), int(row.s1 or 0), int(row.s2 or 0)


def checksum_duck(con, sql: str, cols: list[str]) -> tuple[int, int, int]:
    parts = ", ".join(
        f"coalesce(CAST(\"{c}\" AS VARCHAR), '<null>')" for c in sorted(cols)
    )
    q = f"""
    SELECT COUNT(*) AS n,
           CAST(COALESCE(SUM(h1), 0) AS BIGINT) AS s1,
           CAST(COALESCE(SUM(h2), 0) AS BIGINT) AS s2
    FROM (SELECT {_duck_hex8("substr(md5(concat_ws('|', " + parts + ")), 1, 8)")} AS h1,
                 {_duck_hex8("substr(md5(concat_ws('|', " + parts + ")), 9, 8)")} AS h2
          FROM ({sql}))
    """
    n, s1, s2 = con.sql(q).fetchone()
    return int(n), int(s1), int(s2)


# For each bounds-listed query whose ENGINE side can legitimately
# refuse past its documented domain, the substring its guard message
# must contain. An exception that does NOT match is an unrelated
# engine regression and must fall through to [FAIL] (ADVICE r11) —
# queries absent here have no engine-side guard at all (their bound
# is oracle-side only), so any engine exception is a real failure.
_ENGINE_GUARD_TEXT = {
    "q174_srp_lsh_pairs": "exceeds candidate_budget",
}


def _bounded_engine_skip(name, bounds, spark, sf_dir, e) -> bool:
    """An engine-side guard raising INSIDE a documented oracle bound
    is designed behavior (e.g. q174's fixed 8-bit SRP bands refusing
    200k vectors), not a differential failure: record it as a named
    skip so scale fixtures distinguish 'out of validity domain' from
    'broken'. The exception must MATCH the documented guard text —
    an unrelated engine error inside the bound still FAILs."""
    if name not in bounds:
        return False
    guard_text = _ENGINE_GUARD_TEXT.get(name)
    if guard_text is None or guard_text not in str(e):
        return False
    try:
        reason = bounds[name](spark, sf_dir)
    except Exception:
        return False
    if reason is None:
        return False
    first = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
    print(f"[skip-oracle] {name}: engine guard fired within documented "
          f"bound: {reason} (engine said: {first})")
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    checksum_threshold = int(
        os.environ.get("SPARK_GRAFT_CHECKSUM_THRESHOLD", "0")
    )

    from redskins_rule_spark import workload
    from redskins_rule_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    # Big-SF hardening (the sf10 OOM lesson): DuckDB's in-memory
    # connection otherwise grows its buffer pool toward 80% of RAM
    # and never returns it, and the NEXT Spark query pays the bill.
    # Opt-in via env so small-SF behavior is byte-identical.
    mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM")
    if mem:
        con.sql(f"SET memory_limit='{mem}'")
    tmp = os.environ.get("SPARK_GRAFT_DUCKDB_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.sql(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        # scale fixtures (tools/make_scale.py / make_skew.py) are
        # Spark-written DIRECTORIES of part files; the driver testdata
        # tables are single files — glob accordingly so the skew/scale
        # differentials (VERDICT r7 item 4) run through this same gate
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs, os_ = workload.queries(), workload.oracles()
    bounds = workload.oracle_bounds()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if checksum_threshold:
            try:
                sdf_lazy = fn(spark, sf_dir)
                n_s = sdf_lazy.count()
            except Exception as e:
                if _bounded_engine_skip(name, bounds, spark, sf_dir, e):
                    continue
                print(f"[FAIL] {name}: spark error: {e}")
                failed.append(name)
                continue
            if name in os_ and name not in bounds and n_s > checksum_threshold:
                stypes = {t for _c, t in sdf_lazy.dtypes}
                rel = con.sql(f"SELECT * FROM ({os_[name]}) LIMIT 0")
                otypes = {str(t) for t in rel.types}
                if sorted(sdf_lazy.columns) != sorted(rel.columns):
                    print(
                        f"[FAIL] {name}: columns differ: "
                        f"spark={sorted(sdf_lazy.columns)} "
                        f"oracle={sorted(rel.columns)}"
                    )
                    failed.append(name)
                    continue
                duck_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
                stable = [
                    c for c, t in sdf_lazy.dtypes
                    if t in _CHECKSUM_SPARK_TYPES
                    and duck_types.get(c) in _CHECKSUM_DUCK_TYPES
                ]
                if not stable:
                    print(
                        f"[count-only] {name}: {n_s} rows — too big to "
                        "materialize and no checksum-stable column "
                        f"(spark={sorted(stypes)})"
                    )
                    n_o = con.sql(
                        f"SELECT COUNT(*) FROM ({os_[name]})"
                    ).fetchone()[0]
                    if n_o != n_s:
                        print(
                            f"[FAIL] {name}: row count differs: "
                            f"spark={n_s} oracle={n_o}"
                        )
                        failed.append(name)
                    continue
                partial = len(stable) < len(sdf_lazy.columns)
                s = checksum_spark(sdf_lazy.select(*stable))
                o = checksum_duck(con, os_[name], stable)
                if s != o:
                    print(
                        f"[FAIL] {name}: checksum differs"
                        + (f" over stable columns {sorted(stable)}"
                           if partial else "")
                        + f": spark={s} oracle={o}"
                    )
                    failed.append(name)
                elif partial:
                    dropped = sorted(set(sdf_lazy.columns) - set(stable))
                    print(
                        f"[ok-checksum-partial] {name}: {n_s} rows over "
                        f"stable columns {sorted(stable)} (float/unstable "
                        f"columns {dropped} not hashed)"
                    )
                else:
                    print(f"[ok-checksum] {name}: {n_s} rows")
                continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            if _bounded_engine_skip(name, bounds, spark, sf_dir, e):
                continue
            print(f"[FAIL] {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in os_:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        if name in bounds:
            reason = bounds[name](spark, sf_dir)
            if reason is not None:
                print(f"[skip-oracle] {name}: {reason} ({len(sdf)} rows ran)")
                continue
        try:
            odf = con.sql(os_[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"[FAIL] {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"[ok] {name}: {len(sdf)} rows")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
