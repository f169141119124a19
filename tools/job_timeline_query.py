"""Job timeline for one workload query: run it solo (UI-enabled
session), then print every job with submission/completion wall times
AND the driver-side GAP before it — the number a stage report can't
give. Streaming drains are mostly fixed cost (query start/stop, source
listing, WAL commits, provider init): the gaps name it.

Usage: python tools/job_timeline_query.py <query> [sf_dir] [--runs 2]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, "/root/repo")


def fetch(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def _ts(s: str) -> float:
    # Spark REST timestamps: 2026-08-18T15:00:00.123GMT
    return datetime.strptime(s.replace("GMT", "+0000"),
                             "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else "/root/testdata/sf0.1"
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])

    from redskins_rule_spark import workload
    from redskins_rule_spark.session import get_spark

    spark = get_spark(
        f"job_timeline_{name}", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    reg = workload.queries()
    if name not in reg:
        print(f"unknown query {name!r}", file=sys.stderr)
        return 2
    fn = reg[name]
    for run in range(runs):
        seen = {j["jobId"] for j in fetch(f"{base}/jobs")}
        t0 = time.time()
        fn(spark, sf_dir).count()
        wall = time.time() - t0
        jobs = [j for j in fetch(f"{base}/jobs") if j["jobId"] not in seen]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name} run {run + 1}: wall {wall:.3f}s, "
              f"{len(jobs)} jobs ===")
        print(f"{'job':>4} {'gap_s':>6} {'dur_s':>6} {'tasks':>5}  description")
        prev_end = t0
        total_gap = total_dur = 0.0
        for j in jobs:
            sub = _ts(j["submissionTime"])
            end = _ts(j["completionTime"]) if j.get("completionTime") else sub
            gap = max(0.0, sub - prev_end)
            dur = end - sub
            total_gap += gap
            total_dur += dur
            prev_end = max(prev_end, end)
            desc = (j.get("description") or j.get("name") or "")[:70]
            print(f"{j['jobId']:>4} {gap:>6.2f} {dur:>6.2f} "
                  f"{j.get('numTasks', 0):>5}  {desc}")
        tail = max(0.0, t0 + wall - prev_end)
        print(f"sum gaps {total_gap:.2f}s + job time {total_dur:.2f}s "
              f"+ tail {tail:.2f}s ~= wall {wall:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
