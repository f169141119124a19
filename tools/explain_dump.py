"""Dump .explain("formatted") for workload queries to files.

Usage: python tools/explain_dump.py <out_dir> <suffix> [sf_dir] [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each named query (default:
every registry query) — the physical-plan evidence the optimization
rounds commit under plans/r13/. Plans are built, not executed (no
bench contamination); AQE leaves `AdaptiveSparkPlan isFinalPlan=false`
markers, which is expected for the "shape" evidence (Exchange count,
join strategy, PushedFilters, Python-eval nodes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redskins_rule_spark import workload  # noqa: E402
from redskins_rule_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    qs = workload.queries()
    unknown = [q for q in rest if q not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    names = rest or list(qs)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain_dump")
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — one bad plan must not void the dump
            txt = f"EXPLAIN FAILED: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"[plan] {name} -> {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
