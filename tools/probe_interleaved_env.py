"""Interleaved A/B of one ENV VAR on one query — the env-gated twin of
probe_interleaved.py (that one flips a Spark conf; several engine knobs
— spread bytes, state sizing — are read from os.environ per query, so
flipping the env between runs in one warm session gives the same
steal-resistant interleaving).

Usage: python tools/probe_interleaved_env.py <ENV_NAME> <valA> <valB> <query>[,query...] [pairs]
Use '-' for "unset".
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _stat():
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    busy = v[0] + v[1] + v[2] + v[5] + v[6] + (v[7] if len(v) > 7 else 0)
    return busy, (v[7] if len(v) > 7 else 0)


def main():
    key, va, vb, names = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4].split(",")
    pairs = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    from redskins_rule_spark import workload
    from redskins_rule_spark.session import get_spark

    spark = get_spark()
    reg = workload.queries()
    sf = "/root/testdata/sf0.1"
    for name in names:
        fn = reg[name]
        fn(spark, sf).count()  # warm
        res = {"A": [], "B": []}
        for i in range(pairs):
            for arm, val in (("A", va), ("B", vb)):
                if val == "-":
                    os.environ.pop(key, None)
                else:
                    os.environ[key] = val
                a = _stat()
                t0 = time.monotonic()
                fn(spark, sf).count()
                w = time.monotonic() - t0
                b = _stat()
                busy, steal = b[0] - a[0], b[1] - a[1]
                pct = 100.0 * steal / busy if busy else 0.0
                res[arm].append((w, pct))
                print(f"{name} {arm}={val} pair{i}: {w:7.3f}s steal%={pct:5.1f}",
                      flush=True)
        for arm, val in (("A", va), ("B", vb)):
            best = min(w for w, _ in res[arm])
            med = sorted(w for w, _ in res[arm])[len(res[arm]) // 2]
            print(f"{name} {arm}({key}={val}): best={best:.3f} med={med:.3f}",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
