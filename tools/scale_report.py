"""Scale-up regression report: per-query wall ratio between two SFs.

Runs every workload query at a base and a scaled SF directory (the
scaled one is regenerated via make_scale.py if absent), prints the
per-query ratio table sorted worst-first, and exits 1 if any query
exceeds `--max-ratio` (default 10.0 — i.e. superlinear for the
default ×10 replication). This turns "would it survive a scale-up?"
from a judgment call into a command:

    python tools/scale_report.py                   # sf0.1 -> .scale/sf1
    python tools/scale_report.py --max-ratio 8
    # x100 probe of the pair-emitter/graph families (VERDICT r5 item 5):
    python tools/scale_report.py --scaled .scale/sf10 --factor 100 \
        --only q19_ngram_jaccard,q20_minhash_lsh,...

Interpretation notes printed with the table: near-dup pair emitters
(q25/q25b/q19/q20/...) legitimately grow with the TRUE pair count,
which ×10 replication inflates quadratically — their runtime is
linear in emitted pairs (the documented contract), so ratios up to
~6 are expected there, not plan regressions.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def time_queries(
    spark, sf_dir: str, only: set[str] | None = None
) -> tuple[dict[str, float], list[str]]:
    from redskins_rule_spark import workload

    out: dict[str, float] = {}
    errs: list[str] = []
    reg = workload.queries()
    if only is not None:
        missing = only - set(reg)
        if missing:
            raise SystemExit(f"--only names unknown queries: {sorted(missing)}")
        reg = {k: v for k, v in reg.items() if k in only}
    for name, fn in reg.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).count()
            out[name] = time.time() - t0
        except Exception as e:  # keep going, but the gate must see it
            errs.append(name)
            print(f"[err] {name}: {e}", file=sys.stderr)
    return out, errs


def main() -> int:
    base = "/root/testdata/sf0.1"
    scaled = "/root/repo/.scale/sf1"
    max_ratio = None
    factor = 10.0
    only: set[str] | None = None
    args = sys.argv[1:]
    if "--base" in args:
        base = args[args.index("--base") + 1]
    if "--scaled" in args:
        scaled = args[args.index("--scaled") + 1]
    if "--factor" in args:
        factor = float(args[args.index("--factor") + 1])
    if "--max-ratio" in args:
        max_ratio = float(args[args.index("--max-ratio") + 1])
    if max_ratio is None:
        max_ratio = factor  # linear-in-data bound by default
    if "--only" in args:
        only = set(args[args.index("--only") + 1].split(","))

    if not os.path.isdir(scaled):
        if only is None and scaled.endswith("sf1"):
            print(f"[gen] {scaled} missing — running make_scale.py")
            import subprocess

            subprocess.run(
                [sys.executable, "/root/repo/tools/make_scale.py"], check=True
            )
        else:
            raise SystemExit(
                f"{scaled} missing — generate it first, e.g. "
                f"python tools/make_scale.py {base} {scaled} {int(factor)}"
            )

    from redskins_rule_spark.session import get_spark

    spark = get_spark()
    t_base, err_base = time_queries(spark, base, only)
    t_scaled, err_scaled = time_queries(spark, scaled, only)

    rows = []
    for name, tb in t_base.items():
        ts = t_scaled.get(name)
        if ts is None:
            continue
        # sub-second base timings are fixed-cost noise — floor the
        # denominator instead of zeroing the ratio, so a regression
        # FROM a fast base (0.25s -> 300s) still trips the gate
        ratio = ts / max(tb, 0.3)
        rows.append((ratio, tb, ts, name))
    rows.sort(reverse=True)

    print(f"\n{'ratio':>6} {'base_s':>8} {'scaled_s':>9}  query")
    for ratio, tb, ts, name in rows[:25]:
        print(f"{ratio:6.1f} {tb:8.2f} {ts:9.2f}  {name}")
    total_b = sum(t_base.values())
    total_s = sum(t_scaled.values())
    print(f"\ntotals: base {total_b:.1f}s -> scaled {total_s:.1f}s "
          f"({total_s / total_b:.2f}x wall for the SF factor)")

    bad = [(n, r) for r, tb, ts, n in rows if r > max_ratio]
    # One-shot timings inside a 174-query sweep carry same-session
    # noise (GC pauses, cache churn from neighbors, host jitter) that
    # has produced >10x FALSE flags on queries whose isolated ratio is
    # <2x. Before failing, re-measure each offender back-to-back at
    # both SFs and keep the better of the two observations per side —
    # a REAL super-linear plan stays super-linear under re-measurement;
    # noise doesn't.
    if bad:
        retried = []
        for name, first_ratio in bad:
            fn = __import__(
                "redskins_rule_spark.workload", fromlist=["queries"]
            ).queries()[name]
            t0 = time.time(); fn(spark, base).count()
            tb2 = min(t_base[name], time.time() - t0)
            t0 = time.time(); fn(spark, scaled).count()
            ts2 = min(t_scaled[name], time.time() - t0)
            r2 = ts2 / max(tb2, 0.3)
            print(f"[retry] {name}: first {first_ratio:.1f}x -> "
                  f"isolated {r2:.1f}x ({tb2:.2f}s -> {ts2:.2f}s)")
            if r2 > max_ratio:
                retried.append((name, r2))
        bad = retried
    # a query that only fails at the scaled SF is the WORST scale
    # regression — never let it fall out of the gate silently
    crashed = sorted(set(err_scaled) - set(err_base))
    spark.stop()
    if bad or crashed:
        if bad:
            print(f"\nFAIL: {len(bad)} queries exceed {max_ratio}x: {bad}")
        if crashed:
            print(f"\nFAIL: {len(crashed)} queries error only at the "
                  f"scaled SF: {crashed}")
        return 1
    print(f"\nOK: no query exceeds {max_ratio}x and none crash at scale")
    return 0


if __name__ == "__main__":
    sys.exit(main())
