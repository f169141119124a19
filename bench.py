"""Benchmark runner (driver contract).

Runs the workload's queries at a scale-factor directory on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line: {"metric": ...,
"value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}.

Usage: python bench.py [sf_dir] [query ...]
  * no args            — full 242-query suite at $SPARK_GRAFT_SF_DIR
                         (default /root/testdata/sf0.1); per-query
                         detail goes to BENCH_DETAIL.json (the driver
                         contract path — this is the ONLY invocation
                         that writes it).
  * sf_dir             — full suite at that directory; detail goes to
                         tools/logs/BENCH_DETAIL_<tag>_<ts>.json.
  * sf_dir query ...   — only the named queries (unknown names are an
                         error, not a silent full run — VERDICT r12
                         witnessed the old behavior ignoring argv and
                         clobbering the driver's detail file).

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
REPO = os.path.dirname(os.path.abspath(__file__))


def _cpu_stat() -> tuple[int, int] | None:
    """(busy_jiffies, steal_jiffies) from /proc/stat, or None off-Linux."""
    try:
        v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    except (OSError, ValueError, IndexError):
        return None
    # user nice system idle iowait irq softirq steal
    busy = v[0] + v[1] + v[2] + v[5] + v[6] + (v[7] if len(v) > 7 else 0)
    return busy, (v[7] if len(v) > 7 else 0)


def _steal_pct(a, b) -> float | None:
    """Hypervisor steal as % of BUSY cpu over the run — the witness
    loadavg can't give: this VM shows multi-minute steal bursts that
    inflate whatever query is running 3-10x while the host looks idle
    (round-13 forensics; loadavg alone said 'quiet' for those runs)."""
    if not a or not b:
        return None
    busy, steal = b[0] - a[0], b[1] - a[1]
    return round(100.0 * steal / busy, 2) if busy > 0 else None


def _parse_argv(argv: list[str], registry: dict) -> tuple[str | None, list[str]]:
    """Return (sf_dir_or_None, subset). Flags are rejected; a first
    positional that is neither a directory nor a registered query name
    is rejected by name (a typo'd sf_dir must not become a full run)."""
    bad = [a for a in argv if a.startswith("-")]
    if bad:
        raise SystemExit(f"bench.py takes no flags (got {bad}); "
                         "usage: python bench.py [sf_dir] [query ...]")
    if not argv:
        return None, []
    sf_dir, rest = argv[0], argv[1:]
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"bench.py: sf_dir {sf_dir!r} is not a directory; "
                         "usage: python bench.py [sf_dir] [query ...]")
    unknown = [q for q in rest if q not in registry]
    if unknown:
        raise SystemExit(f"bench.py: unknown queries {unknown}; "
                         f"registry has {len(registry)} names")
    return sf_dir, rest


def main() -> None:
    qs = workload.queries()
    sf_arg, subset = _parse_argv(sys.argv[1:], qs)
    sf_dir = sf_arg or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    if subset:
        qs = {k: qs[k] for k in subset}
    spark = get_spark("bench")

    # warmup: run one light query to spin up the JVM / codegen paths
    workload.queries()["q01_pricing_summary"](spark, WARMUP_SF).count()

    # host-contention witness (VERDICT r11: the driver-run uniform
    # 1.37× was contention, diagnosable only by re-timing): record
    # the 1/5/15-min load averages at start AND end so a contended
    # bench is readable from the artifact alone
    load_start = [round(x, 2) for x in os.getloadavg()]
    stat_start = _cpu_stat()
    times: dict[str, float] = {}
    # per-query steal witness (r13 forensics: this VM's multi-minute
    # steal bursts inflate whichever queries they overlap 3-10x; the
    # run-level number can't say WHICH — the detail artifact now can)
    q_steal: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        q_stat0 = _cpu_stat()
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.count()
        except Exception as e:  # noqa: BLE001 — one bad query must not void the bench
            errors[name] = str(e).splitlines()[0][:300] if str(e) else type(e).__name__
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
            continue
        times[name] = round(time.perf_counter() - t0, 3)
        s = _steal_pct(q_stat0, _cpu_stat())
        if s is not None:
            q_steal[name] = s
    total = round(sum(times.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    loadavg = {"start": load_start,
               "end": [round(x, 2) for x in os.getloadavg()],
               "cpus": os.cpu_count()}
    steal = _steal_pct(stat_start, _cpu_stat())
    detail = {
        "metric": "workload_total_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
        "sf_dir": sf_dir,
        "loadavg": loadavg,
        "steal_pct_of_busy": steal,
    }
    if q_steal:
        detail["query_steal_pct_of_busy"] = q_steal
    if errors:
        detail["errors"] = errors
    # Detail path (VERDICT r12 item 2): ONLY the driver's invocation
    # (no argv) owns BENCH_DETAIL.json; any parameterized run writes a
    # uniquely named file under tools/logs/ so it can never clobber
    # the driver's artifact.
    if sf_arg is None and not subset:
        detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    else:
        tag = os.path.basename(sf_dir.rstrip("/")) + ("_subset" if subset else "")
        ts = time.strftime("%Y%m%dT%H%M%S")
        detail_path = os.path.join(REPO, "tools", "logs",
                                   f"BENCH_DETAIL_{tag}_{ts}.json")
        os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError as e:  # detail file is best-effort; the stdout line is the contract
        print(f"bench: could not write {detail_path}: {e}", file=sys.stderr)

    # The driver captures only the last ~2000 bytes of stdout; the final
    # line must stay well under that, so print only the slowest queries
    # inline and point at the detail file for the full per-query dict.
    top = dict(sorted(times.items(), key=lambda kv: -kv[1])[:15])
    out = {
        "metric": "workload_total_time",
        "value": total,
        "unit": "sec",
        "queries": top,
        "sf": sf_val,
        "n_queries": len(times),
        "n_errors": len(errors),
        "loadavg": loadavg,
        "steal_pct_of_busy": steal,
        "detail": os.path.relpath(detail_path, REPO),
    }
    line = json.dumps(out)
    while len(line) > 1500 and out["queries"]:
        out["queries"].pop(next(reversed(out["queries"])))
        line = json.dumps(out)
    print(line)
    spark.stop()
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
