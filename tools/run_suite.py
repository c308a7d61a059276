"""Full-suite CI runner with per-file process isolation.

Rationale: jaxlib's XLA:CPU pipeline has segfaulted/aborted four separate
full-suite runs inside `backend_compile_and_load` on the largest x64
reference-parity programs — each time at a DIFFERENT test, and every crash
site passes standalone (see tests/conftest.py; serializing LLVM codegen via
--xla_cpu_parallel_codegen_split_count=1 reduced but did not eliminate the
flake). Running each test file in a fresh process sidesteps the accumulated
in-process compiler state, isolates any crash to one file, and makes a
crash retryable without losing the rest of the record.

Usage: python tools/run_suite.py [-m EXPR] [--out SUITE.json]
Writes a JSON record (per-file rc/pass/fail counts/wall time) and prints a
one-line summary. Exit 0 iff every file passed (no failures, no crashes).
"""

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_file(path, marker, timeout):
    cmd = [sys.executable, "-m", "pytest", path, "-q"]
    if marker:
        cmd += ["-m", marker]
    t0 = time.time()
    try:
        p = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
        rc, out = p.returncode, (p.stdout or "") + (p.stderr or "")
    except subprocess.TimeoutExpired as e:
        rc, out = 124, (e.stdout or b"").decode(errors="replace")
    wall = time.time() - t0
    if rc == 5:
        # pytest exit 5 = no tests collected/selected (e.g. a slow-only
        # file under -m 'not slow') — an empty file is a clean pass, not
        # a crash to retry or a red suite
        rc = 0
    tail = out.strip().splitlines()[-1] if out.strip() else ""
    counts = dict(
        (k, int(v))
        for v, k in re.findall(r"(\d+) (passed|failed|error|skipped)", out)
    )
    return {
        "file": os.path.relpath(path, REPO),
        "rc": rc,
        "wall_s": round(wall, 1),
        "tail": tail[-200:],
        **counts,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", dest="marker", default=None,
                    help="pytest -m expression (e.g. 'not slow')")
    ap.add_argument("--out", default=os.path.join(REPO, "SUITE_RECORD.json"))
    ap.add_argument("--timeout", type=int, default=4800,
                    help="per-file timeout (s); the slow M=1000 golden "
                         "parity solve dominates")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    results = []
    t0 = time.time()
    for path in files:
        r = run_file(path, args.marker, args.timeout)
        # a crash (signal: negative rc / >=128) or timeout is a flake
        # candidate, not a test failure — retry once in a fresh process
        if r["rc"] not in (0, 1):
            print(f"[suite] {r['file']} rc={r['rc']} — retrying once",
                  flush=True)
            r2 = run_file(path, args.marker, args.timeout)
            r2["retried_after_rc"] = r["rc"]
            r = r2
        results.append(r)
        print(f"[suite] {r['file']}: rc={r['rc']} "
              f"passed={r.get('passed', 0)} failed={r.get('failed', 0)} "
              f"({r['wall_s']}s)", flush=True)

    total = {
        "passed": sum(r.get("passed", 0) for r in results),
        "failed": sum(r.get("failed", 0) for r in results),
        "error": sum(r.get("error", 0) for r in results),
        "skipped": sum(r.get("skipped", 0) for r in results),
        "files_bad_rc": [r["file"] for r in results if r["rc"] != 0],
        "wall_s": round(time.time() - t0, 1),
        "marker": args.marker,
        "green": all(r["rc"] == 0 for r in results),
    }
    record = {"total": total, "files": results}
    with open(args.out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"[suite] TOTAL passed={total['passed']} failed={total['failed']} "
          f"green={total['green']} wall={total['wall_s']}s -> {args.out}",
          flush=True)
    sys.exit(0 if total["green"] else 1)


if __name__ == "__main__":
    main()
