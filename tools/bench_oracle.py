"""Time the DuckDB oracle suite at a given SF dir — the yardstick for
SURVEY's engine-vs-oracle comparison (BASELINE.md publishes no
reference numbers, so the same-relation DuckDB implementations on the
same parquet are the operative single-node baseline).

Usage: python tools/bench_oracle.py [sf_dir] [query ...]
Prints one JSON line: {"total_sec": ..., "queries": {...}} and writes
a full per-query detail file (loadavg-witnessed, VERDICT r12 item 2)
to tools/logs/BENCH_ORACLE_<tag>_<ts>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from redskins_rule_spark import workload  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:]) or None
    con = duckdb.connect()
    for t in TABLES:
        # scale fixtures are Spark-written DIRECTORIES of part files;
        # driver testdata tables are single files — glob accordingly
        # (same handling as tools/check_correctness.py)
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    load_start = [round(x, 2) for x in os.getloadavg()]
    from bench import _cpu_stat, _steal_pct  # repo root on sys.path above
    stat_start = _cpu_stat()
    times: dict[str, float] = {}
    for name, sql in workload.oracles().items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            con.sql(sql).fetchall()
        except Exception as e:  # noqa: BLE001
            times[name] = -1.0
            print(f"oracle {name} FAILED: {e}", file=sys.stderr)
            continue
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"[t] {name} {times[name]}", file=sys.stderr, flush=True)
    total = round(sum(v for v in times.values() if v > 0), 3)
    # Full detail artifact (same contract as bench.py's parameterized
    # runs): loadavg at start AND end so a contended run is readable
    # from the artifact alone.
    detail = {
        "metric": "oracle_total_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf_dir": sf_dir,
        "loadavg": {"start": load_start,
                    "end": [round(x, 2) for x in os.getloadavg()],
                    "cpus": os.cpu_count()},
        "steal_pct_of_busy": _steal_pct(stat_start, _cpu_stat()),
    }
    tag = os.path.basename(sf_dir.rstrip("/")) + ("_subset" if only else "")
    ts = time.strftime("%Y%m%dT%H%M%S")
    detail_path = os.path.join("/root/repo", "tools", "logs",
                               f"BENCH_ORACLE_{tag}_{ts}.json")
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps({"total_sec": total, "n": len(times),
                      "slowest": dict(sorted(times.items(), key=lambda kv: -kv[1])[:10]),
                      "steal_pct_of_busy": detail["steal_pct_of_busy"],
                      "detail": detail_path}))


if __name__ == "__main__":
    main()
