#!/usr/bin/env python3
"""Scale-sweep driver for the DuckDB correctness gate (r8 verdict task
4): runs compare_local.py ONE QUERY PER SUBPROCESS with a wall-clock
timeout, so a single oracle whose SQL doesn't scale (e.g. a recursive
CTE at sf1) reports TIMEOUT instead of eating the whole sweep.

Usage: python3 tools/compare_scale.py <sfDir> <verifyOutDir> [timeoutSec] [parallel] [--strict]

Exit code: 1 on any FAIL; with --strict, TIMEOUT also exits 1 (a gating
caller must not read a sweep with unverified oracles as green — without
the flag, timeouts are reported but tolerated, the exploratory mode for
sweeps where some oracles are KNOWN not to scale, e.g. recursive CTEs
at sf10).
"""
import json
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor


def run_one(args):
    sf_dir, out_dir, name, timeout = args
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "tools/compare_local.py", sf_dir, out_dir, "--only", name],
            capture_output=True, text=True, timeout=timeout)
        wall = time.time() - t0
        ok = r.returncode == 0 and f"PASS {name}" in r.stdout
        detail = "" if ok else " | " + " ".join(
            l for l in r.stdout.splitlines() if l.startswith("FAIL"))[:300]
        return name, ("PASS" if ok else "FAIL"), wall, detail
    except subprocess.TimeoutExpired:
        return name, "TIMEOUT", time.time() - t0, ""


def main():
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv
    sf_dir, out_dir = argv[0], argv[1]
    timeout = int(argv[2]) if len(argv) > 2 else 300
    parallel = int(argv[3]) if len(argv) > 3 else 4
    names = sorted(json.load(open(f"{out_dir}/oracle_sql.json")))
    results = []
    with ThreadPoolExecutor(max_workers=parallel) as ex:
        for res in ex.map(run_one, [(sf_dir, out_dir, n, timeout) for n in names]):
            name, status, wall, detail = res
            print(f"{status:7s} {name} ({wall:.1f}s){detail}", flush=True)
            results.append(res)
    n = {s: sum(1 for r in results if r[1] == s) for s in ("PASS", "FAIL", "TIMEOUT")}
    total_wall = sum(r[2] for r in results)
    print(f"\n{n['PASS']} passed, {n['FAIL']} failed, {n['TIMEOUT']} timed out; "
          f"oracle wall {total_wall:.0f}s across {len(results)} queries")
    sys.exit(1 if (n["FAIL"] or (strict and n["TIMEOUT"])) else 0)


if __name__ == "__main__":
    main()
