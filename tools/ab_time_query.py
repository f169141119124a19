"""Warm A/B timer for one or more workload queries under an env toggle.

Starts ONE session, warms each query once, then times N consecutive
runs and prints per-run wall seconds plus the host steal%/busy over
each run — so a hypervisor-steal burst is visible per measurement
instead of poisoning a whole suite silently (round-13 forensics).

Usage:
  python tools/ab_time_query.py q174_srp_lsh_pairs[,q175_...] [sf_dir] [--runs 3]

Env toggles under test are set by the CALLER (e.g.
SPARK_GRAFT_SPREAD_BYTES=0 python tools/ab_time_query.py ...).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def _stat():
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    busy = v[0] + v[1] + v[2] + v[5] + v[6] + (v[7] if len(v) > 7 else 0)
    return busy, (v[7] if len(v) > 7 else 0)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else "/root/testdata/sf0.1"
    runs = 3
    if "--runs" in sys.argv:
        try:
            runs = int(sys.argv[sys.argv.index("--runs") + 1])
        except (IndexError, ValueError):
            print("--runs takes an integer", file=sys.stderr)
            return 2

    from redskins_rule_spark import workload
    from redskins_rule_spark.session import get_spark

    spark = get_spark()
    reg = workload.queries()
    for name in names:
        fn = reg[name]
        spark.sparkContext.setJobDescription(f"ab:{name}:warmup")
        fn(spark, sf_dir).count()  # warm
        walls = []
        for i in range(runs):
            a = _stat()
            t0 = time.monotonic()
            spark.sparkContext.setJobDescription(f"ab:{name}:run{i}")
            fn(spark, sf_dir).count()
            wall = time.monotonic() - t0
            b = _stat()
            busy, steal = b[0] - a[0], b[1] - a[1]
            pct = 100.0 * steal / busy if busy else 0.0
            walls.append((wall, pct))
            print(f"{name} run{i}: {wall:7.3f}s  steal%busy={pct:5.1f}",
                  flush=True)
        best = min(w for w, _ in walls)
        print(f"{name} BEST: {best:.3f}s over {runs} warm runs", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
