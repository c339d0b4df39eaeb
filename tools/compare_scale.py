#!/usr/bin/env python3
"""Scale-sweep driver for the DuckDB correctness gate (r8 verdict task
4): runs the per-query compare ONE QUERY PER SUBPROCESS with a
wall-clock timeout, so a single oracle whose SQL doesn't scale (e.g. a
recursive CTE at sf1) reports TIMEOUT instead of eating the whole sweep.

Usage: python3 tools/compare_scale.py <sfDir> <verifyOutDir> [timeoutSec]
           [parallel] [--strict] [--watch]
           [--fallback <sfA_out>:<factorA>:<factorB>] [--record <file>]

Env:
  COMPARE_SCRIPT  per-query compare script (default tools/compare_local.py;
                  set tools/compare_fast.py for sf>=1 sweeps — parity of
                  the fast path vs the gate replica is proven over the
                  full sf0.01 inventory, see SURVEY §6).

--watch (r13, full-inventory sf10 sweep): instead of requiring all Spark
outputs up front, poll <verifyOutDir> and compare each query as soon as
its parquet directory has a _SUCCESS marker, so DuckDB oracle work
pipelines behind the multi-hour Spark Verify instead of serializing
after it. The watch ends when a <verifyOutDir>/VERIFY_DONE sentinel
exists (touch it when the Verify JVM exits) and every discovered key has
been compared; keys never produced by then are reported as NO-OUTPUT
failures.

--fallback (r14, the r13 verdict's auto-fallback): when a compare TIMES
OUT or fails on a RESOURCE error (DuckDB spill ENOSPC / IO Error / OOM
— not a value mismatch), and the key has an entry in
tools/replication_proofs.json, automatically run the three-part
replication proof (tools/compare_replicated.py) against the given
already-oracle-verified smaller-scale output: <sfA_out> is that run's
verify dir, <factorA>/<factorB> the two ScaleGen factors. Such keys
report PASS-R (pass, replicated-proof path). A value-mismatch FAIL
never falls back — the proof cannot launder a wrong answer, only an
unrunnable oracle.

--record <file>: write the sweep artifact — JSON {key: {status, path,
wall}} where path is "oracle" or "replicated" — so the round notes can
state mechanically which path graded each key.

Exit code: 1 on any FAIL; with --strict, TIMEOUT also exits 1 (a gating
caller must not read a sweep with unverified oracles as green — without
the flag, timeouts are reported but tolerated, the exploratory mode for
sweeps where some oracles are KNOWN not to scale, e.g. recursive CTEs
at sf10).
"""
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

COMPARE_SCRIPT = os.environ.get("COMPARE_SCRIPT", "tools/compare_local.py")

PROOFS_FILE = os.path.join(os.path.dirname(__file__), "replication_proofs.json")

# A FAIL is resource-inflicted (oracle unrunnable on this box) iff its
# detail matches one of these; anything else is a value/schema mismatch
# and must never fall back.
RESOURCE_MARKERS = ("IO Error", "Out of Memory", "OutOfMemory",
                    "No space left", "ENOSPC", "Cannot allocate",
                    "could not allocate", "Disk Full", "disk is full")

FALLBACK = None  # (sfA_out, factorA, factorB) when --fallback given
PROOFS = {}


def run_replicated(out_dir, name):
    """Three-part replication proof for one key; returns (ok, wall)."""
    cfg = PROOFS[name]
    sfa, fa, fb = FALLBACK
    cmd = [sys.executable, "tools/compare_replicated.py",
           sfa, out_dir, str(fa), str(fb),
           "--key", name, "--ids", cfg["ids"]]
    for s in cfg.get("scaled", []):
        cmd += ["--scaled", s]
    if cfg.get("topk"):
        cmd.append("--topk")
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True)
    ok = r.returncode == 0 and f"PASS {name}" in r.stdout
    if not ok:
        sys.stderr.write(f"[fallback {name}] {r.stdout.strip()[:400]}\n")
    return ok, time.time() - t0


def run_one(args):
    sf_dir, out_dir, name, timeout = args
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, COMPARE_SCRIPT, sf_dir, out_dir, "--only", name],
            capture_output=True, text=True, timeout=timeout)
        wall = time.time() - t0
        ok = r.returncode == 0 and f"PASS {name}" in r.stdout
        detail = "" if ok else " | " + " ".join(
            l for l in r.stdout.splitlines() if l.startswith("FAIL"))[:300]
        status = "PASS" if ok else "FAIL"
    except subprocess.TimeoutExpired:
        status, wall, detail = "TIMEOUT", time.time() - t0, ""
    # Auto-fallback: oracle unrunnable (timeout/resource), proof on file.
    if (FALLBACK and name in PROOFS and status != "PASS" and
            (status == "TIMEOUT" or
             any(m in detail for m in RESOURCE_MARKERS))):
        ok2, w2 = run_replicated(out_dir, name)
        if ok2:
            return name, "PASS-R", wall + w2, " | replicated-proof fallback"
        detail += " | replicated-proof fallback FAILED"
        status = "FAIL"
    return name, status, wall, detail


def summarize(results, strict, record):
    n = {s: sum(1 for r in results if r[1] == s)
         for s in ("PASS", "PASS-R", "FAIL", "TIMEOUT")}
    total_wall = sum(r[2] for r in results)
    print(f"\n{n['PASS']} passed, {n['PASS-R']} passed-replicated, "
          f"{n['FAIL']} failed, {n['TIMEOUT']} timed out; "
          f"oracle wall {total_wall:.0f}s across {len(results)} queries")
    if record:
        art = {name: {"status": "PASS" if status == "PASS-R" else status,
                      "path": "replicated" if status == "PASS-R" else "oracle",
                      "wall": round(wall, 1)}
               for name, status, wall, _ in results}
        with open(record, "w") as f:
            json.dump(art, f, indent=1, sort_keys=True)
    sys.exit(1 if (n["FAIL"] or (strict and n["TIMEOUT"])) else 0)


def main():
    global FALLBACK, PROOFS
    strict = "--strict" in sys.argv
    watch = "--watch" in sys.argv
    record = None
    argv_in = sys.argv[1:]
    argv, i = [], 0
    while i < len(argv_in):
        a = argv_in[i]
        if a == "--fallback":
            sfa, fa, fb = argv_in[i + 1].rsplit(":", 2)
            FALLBACK = (sfa, int(fa), int(fb))
            i += 2
        elif a == "--record":
            record = argv_in[i + 1]
            i += 2
        elif a.startswith("--"):
            i += 1
        else:
            argv.append(a)
            i += 1
    if FALLBACK:
        PROOFS = {k: v for k, v in json.load(open(PROOFS_FILE)).items()
                  if not k.startswith("_")}
    sf_dir, out_dir = argv[0], argv[1]
    timeout = int(argv[2]) if len(argv) > 2 else 300
    parallel = int(argv[3]) if len(argv) > 3 else 4
    names = sorted(json.load(open(f"{out_dir}/oracle_sql.json")))
    results = []

    if not watch:
        with ThreadPoolExecutor(max_workers=parallel) as ex:
            for res in ex.map(run_one, [(sf_dir, out_dir, n, timeout) for n in names]):
                name, status, wall, detail = res
                print(f"{status:7s} {name} ({wall:.1f}s){detail}", flush=True)
                results.append(res)
        summarize(results, strict, record)

    # --watch: pipeline compares behind a still-running Verify.
    pending = set(names)
    futures = {}
    with ThreadPoolExecutor(max_workers=parallel) as ex:
        while True:
            ready = [n for n in sorted(pending)
                     if os.path.exists(f"{out_dir}/{n}/_SUCCESS")]
            for n in ready:
                pending.discard(n)
                futures[n] = ex.submit(run_one, (sf_dir, out_dir, n, timeout))
            for n, f in list(futures.items()):
                if f.done():
                    name, status, wall, detail = f.result()
                    print(f"{status:7s} {name} ({wall:.1f}s){detail}", flush=True)
                    results.append(f.result())
                    del futures[n]
            done = os.path.exists(f"{out_dir}/VERIFY_DONE")
            if done and not pending and not futures:
                break
            if done and pending and not futures:
                # Verify exited without producing these (it logs and
                # deletes stale output on failure) — never read as green.
                for n in sorted(pending):
                    print(f"FAIL    {n} (0.0s) | no spark output after VERIFY_DONE",
                          flush=True)
                    results.append((n, "FAIL", 0.0, "no output"))
                break
            time.sleep(10)
    summarize(results, strict, record)


if __name__ == "__main__":
    main()
