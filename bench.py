"""Benchmark runner (driver contract).

Runs the workload's headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully executed (collect-to-count via a cheap action that
still materializes the result) and timed wall-clock; a warmup pass on
sf0.001 primes the JVM so the numbers measure the plans, not JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from redskins_rule_spark import workload  # noqa: E402
from redskins_rule_spark.session import get_spark  # noqa: E402

WARMUP_SF = "/root/testdata/sf0.001"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    qs = workload.queries()
    # warmup: run one light query to spin up the JVM / codegen paths
    qs["q01_pricing_summary"](spark, WARMUP_SF).count()

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.count()
        except Exception as e:  # noqa: BLE001 — one bad query must not void the bench
            errors[name] = str(e).splitlines()[0][:300] if str(e) else type(e).__name__
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
            continue
        times[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(times.values()), 3)
    out = {
        "metric": "workload_total_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
