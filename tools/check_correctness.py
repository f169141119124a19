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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

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
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
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
