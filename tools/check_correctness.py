"""Local mimic of the driver's correctness gate.

Runs every workload query on Spark AND its DuckDB oracle at a given
sf dir, compares row count, column names, and (order-insensitively)
values. Floats compared exactly after the workload's own rounding —
if that flags diffs here, the driver's value-hash will too.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype("float64").round(6)
        elif str(df[c].dtype) in ("object",):
            df[c] = df[c].map(lambda v: float(v) if isinstance(v, (int,)) else v)
        try:
            import decimal
            if df[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
                df[c] = df[c].astype("float64").round(6)
        except Exception:
            pass
        if str(df[c].dtype).startswith(("int", "Int", "uint")):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
    a, b = normalize(sdf), normalize(odf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].tolist(), b[c].tolist()
            bad = 0
            for x, y in zip(av, bv):
                if x is None and y is None:
                    continue
                if isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y):
                        continue
                    if abs(x - y) > 1e-9 * max(1, abs(x), abs(y)):
                        bad += 1
                elif x != y:
                    bad += 1
            if bad:
                problems.append(f"column {c}: {bad}/{len(av)} values differ")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from redskins_rule_spark import workload
    from redskins_rule_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = workload.queries(), workload.oracles()
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
