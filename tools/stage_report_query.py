"""Per-stage metrics for one workload query (VERDICT r11 item 5:
close perf residuals with instrumentation, not another stopwatch).

Runs the named query solo in a UI-enabled session, then reads the
completed stages from Spark's own status REST API and prints them
sorted by executor run time: stage name, tasks, executorRunTime,
input/shuffle-read/shuffle-write bytes, spill. Two runs of the same
query (or of two code revisions) give a stage-by-stage diff that
names WHERE wall time went — the answer a stopwatch can't give.

Usage:
  python tools/stage_report_query.py q184_srp_wide [sf_dir] [--runs 2]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def fetch(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> int:
    # CLI guard (ADVICE r12): no bare IndexError/ValueError — print
    # the documented usage and exit 2 on malformed invocations.
    if len(sys.argv) < 2:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else "/root/testdata/sf0.1"
    runs = 2
    if "--runs" in sys.argv:
        i = sys.argv.index("--runs")
        try:
            runs = int(sys.argv[i + 1])
        except (IndexError, ValueError):
            print("stage_report_query: --runs requires an integer "
                  f"(got {sys.argv[i + 1:i + 2] or 'nothing'})", file=sys.stderr)
            return 2

    from redskins_rule_spark import workload
    from redskins_rule_spark.session import get_spark

    spark = get_spark(
        f"stage_report_{name}", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    reg = workload.queries()
    if name not in reg:
        print(f"stage_report_query: unknown query {name!r} "
              f"(registry has {len(reg)} names)", file=sys.stderr)
        return 2
    fn = reg[name]
    for run in range(runs):
        seen_before = {s["stageId"] for s in fetch(f"{base}/stages")}
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        stages = [s for s in fetch(f"{base}/stages?status=COMPLETE")
                  if s["stageId"] not in seen_before]
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n=== {name} run {run + 1}: wall {wall:.3f}s, "
              f"{len(stages)} stages ===")
        print(f"{'stage':>5} {'tasks':>5} {'runTime_s':>9} {'cpu_s':>8} "
              f"{'input_MB':>9} {'shRead_MB':>9} {'shWrite_MB':>10} "
              f"{'spill_MB':>8}  name")
        for s in stages:
            print(
                f"{s['stageId']:>5} {s['numCompleteTasks']:>5} "
                f"{s.get('executorRunTime', 0) / 1e3:>9.2f} "
                f"{s.get('executorCpuTime', 0) / 1e9:>8.2f} "
                f"{s.get('inputBytes', 0) / 1e6:>9.1f} "
                f"{s.get('shuffleReadBytes', 0) / 1e6:>9.1f} "
                f"{s.get('shuffleWriteBytes', 0) / 1e6:>10.1f} "
                f"{s.get('memoryBytesSpilled', 0) / 1e6:>8.1f}  "
                f"{s['name'].splitlines()[0][:60]}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
