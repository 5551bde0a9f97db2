#!/usr/bin/env python
"""Per-file test runner: the whole suite, green, in one command.

Running all 19 test files in ONE pytest process crashes with a C-level
faulthandler dump partway through (memory growth across ~200 interpret-mode
Pallas compilations on this 1-core host — each file passes in isolation).
This runner executes each test file in its own subprocess, so compilation
caches are released between files, and aggregates the results.

Usage:
    python tests/runner.py             # full suite, one file per process
    python tests/runner.py --smoke     # pytest -m smoke in one process
    python tests/runner.py -k gemm     # filter files by substring
"""

from __future__ import annotations

import argparse
import pathlib
import subprocess
import sys
import time

HERE = pathlib.Path(__file__).parent
REPO = HERE.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="run only -m smoke (fast subset, one process)")
    ap.add_argument("-k", default="", help="substring filter on file names")
    ap.add_argument("--timeout", type=int, default=1200,
                    help="per-file timeout seconds")
    args = ap.parse_args()

    if args.smoke:
        return subprocess.call(
            [sys.executable, "-m", "pytest", "tests", "-m", "smoke", "-q"],
            cwd=REPO,
        )

    files = sorted(HERE.glob("test_*.py"))
    if args.k:
        files = [f for f in files if args.k in f.name]
    results: list[tuple[str, str, float]] = []
    failed = False
    for f in files:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "pytest", str(f), "-q",
                 "--no-header", "-p", "no:cacheprovider"],
                cwd=REPO, timeout=args.timeout,
                capture_output=True, text=True,
            )
            ok = proc.returncode == 0
            tail = proc.stdout.strip().splitlines()
            status = tail[-1] if tail else f"rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            ok, status = False, f"TIMEOUT after {args.timeout}s"
        dt = time.time() - t0
        results.append((f.name, status, dt))
        print(f"{'PASS' if ok else 'FAIL'} {f.name:32s} {dt:7.1f}s  {status}",
              flush=True)
        if not ok:
            failed = True
            print(proc.stdout[-3000:] if "proc" in dir() else "", flush=True)

    total = sum(r[2] for r in results)
    print(f"\n{len(results)} files, total {total:.0f}s, "
          f"{'ALL GREEN' if not failed else 'FAILURES PRESENT'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
