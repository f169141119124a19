"""Chunked full-registry differential for big scale fixtures.

The single-process harness dies at sf10: DuckDB's buffer pool and
pandas frames accumulate in one address space next to a 40g Spark
driver, and the kernel OOM-kills the lot (round-11 incident: 83 GB
anon RSS at query 9 of 224). This wrapper runs
tools/check_correctness.py in FRESH SUBPROCESSES of --chunk queries
each, so (a) memory resets between chunks, (b) one kill loses one
chunk, not the run, and (c) the run is resumable: pass --skip-done
with the same --log and finished queries are not re-run.

Usage:
  python tools/run_chunked_differential.py .scale/sf10 \
      --chunk 6 --log /tmp/sf10_diff.log --skip-done
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

sys.path.insert(0, "/root/repo")

STATUS = re.compile(
    r"^\[(ok|ok-checksum|ok-checksum-partial|count-only|FAIL|skip-oracle"
    r"|rows-only)\] (\S+?):"
)


def done_queries(log_path: str) -> set[str]:
    done: set[str] = set()
    if not os.path.exists(log_path):
        return done
    with open(log_path, errors="replace") as fh:
        for line in fh:
            for part in line.split("\r"):
                m = STATUS.match(part.strip())
                if m:
                    done.add(m.group(2))
    return done


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--chunk", type=int, default=6)
    ap.add_argument("--log", default="/tmp/chunked_diff.log")
    ap.add_argument("--skip-done", action="store_true")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from redskins_rule_spark import workload

    names = list(workload.queries())
    if args.only:
        names = [n for n in names if n in set(args.only)]
    if args.skip_done:
        done = done_queries(args.log)
        names = [n for n in names if n not in done]
        print(f"resuming: {len(done)} done, {len(names)} to run")
    failures: list[str] = []
    with open(args.log, "a") as log:
        for i in range(0, len(names), args.chunk):
            chunk = names[i: i + args.chunk]
            print(f"chunk {i // args.chunk + 1}: {chunk[0]} .. {chunk[-1]}",
                  flush=True)
            # stream the child's output STRAIGHT into the log (child
            # unbuffered via -u): a mid-chunk kill keeps every
            # completed [ok] line, so --skip-done resumes at QUERY
            # granularity — the round-11 incident: a chunk ground 35+
            # minutes inside a heavy pair-emitter while its earlier
            # queries' results sat invisible in a PIPE buffer, and the
            # kill lost them all
            start_pos = log.tell()
            proc = subprocess.run(
                [sys.executable, "-u", "tools/check_correctness.py",
                 args.sf_dir, *chunk],
                stdout=log, stderr=subprocess.STDOUT,
            )
            log.flush()
            with open(args.log, errors="replace") as rf:
                rf.seek(start_pos)
                text = rf.read()
            seen = set()
            for line in text.splitlines():
                for part in line.split("\r"):
                    m = STATUS.match(part.strip())
                    if m:
                        seen.add(m.group(2))
                        if m.group(1) == "FAIL":
                            failures.append(m.group(2))
                            print(f"  FAIL {m.group(2)}", flush=True)
            for n in chunk:
                if n not in seen:
                    failures.append(n)
                    print(f"  DIED {n} (chunk rc={proc.returncode})",
                          flush=True)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
