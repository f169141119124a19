"""Thin CLI — the orchestration surface (SURVEY.md §2.11 O1-O4).

The reference drives everything through four Airflow DAGs
(dags/redskins-rule-dag.py); the engine equivalent is one idempotent
entry point per pipeline, parameterized instead of scheduled:

    python -m redskins_rule_spark redskins \
        --nfl 'data/raw/schedule/v2/*' --elections 'data/raw/elec/*' \
        --out results/

Yearly backfill (the reference's catchup scheduling, O4) is re-running
with the same globs: scans pick up new season files, and the
partitioned, overwrite-mode sink is idempotent.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="redskins_rule_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("redskins", help="run the full redskins-rule pipeline")
    r.add_argument("--nfl", required=True, help="glob of raw NFL schedule parquet")
    r.add_argument("--elections", required=True, help="glob of raw election parquet")
    r.add_argument("--out", required=True, help="output parquet path")
    r.add_argument("--master", default=None)
    r.add_argument("--start-year", type=int, default=1976)

    args = p.parse_args(argv)
    if args.cmd == "redskins":
        from redskins_rule_spark.pipelines.redskins_rule import run_from_paths
        from redskins_rule_spark.session import get_spark

        spark = get_spark("redskins-rule", master=args.master)
        result = run_from_paths(
            spark, args.nfl, args.elections, args.out, start_year=args.start_year
        )
        n = result.count()
        print(f"wrote {n} rows -> {args.out}")
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
