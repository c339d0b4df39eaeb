#!/usr/bin/env python3
"""Cross-run output equality for the partition-invariance sweep (r11
verdict task 4): given N Verify output dirs produced at different
spark.sql.shuffle.partitions settings, assert every query's parquet
output is IDENTICAL across runs under the driver's own normalization
(columns sorted by name, rows sorted, floats at 6dp) — the mechanical
proof that no operator's result depends on partition count or
partition-fold order.

Usage: python3 tools/compare_runs.py <outDirA> <outDirB> [outDirC ...]

Exit 1 if any query differs between any run and the first (baseline)
run, or if the run dirs don't contain the same query set.
"""
import hashlib
import os
import sys

import duckdb


def query_hash(con, out_dir, name):
    path = os.path.join(out_dir, name)
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{path}/*.parquet'").fetchall()]
    types = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{path}/*.parquet'").fetchall()}
    sel = ", ".join(
        f'ROUND(CAST("{c}" AS DOUBLE), 6) AS "{c}"'
        if types[c] in ("FLOAT", "DOUBLE") else f'"{c}"'
        for c in sorted(cols))
    rows = con.execute(
        f"SELECT {sel} FROM '{path}/*.parquet' ORDER BY ALL").fetchall()
    h = hashlib.sha256()
    h.update(("|".join(sorted(cols))).encode())
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()


def main():
    dirs = sys.argv[1:]
    assert len(dirs) >= 2, "need at least two run dirs"
    queries = [
        sorted(d for d in os.listdir(run)
               if os.path.isdir(os.path.join(run, d)))
        for run in dirs]
    if len(set(map(tuple, queries))) != 1:
        sets = [set(q) for q in queries]
        print(f"QUERY SET MISMATCH: {[s - sets[0] for s in sets[1:]]} "
              f"vs missing {[sets[0] - s for s in sets[1:]]}")
        sys.exit(1)
    con = duckdb.connect()
    bad = []
    for name in queries[0]:
        hashes = [query_hash(con, run, name) for run in dirs]
        ok = len(set(hashes)) == 1
        if not ok:
            bad.append(name)
        print(f"{'SAME' if ok else 'DIFF':4s} {name}"
              + ("" if ok else f" {[h[:12] for h in hashes]}"), flush=True)
    print(f"\n{len(queries[0]) - len(bad)} identical, {len(bad)} differ "
          f"across {len(dirs)} runs" + (f": {bad}" if bad else ""))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
