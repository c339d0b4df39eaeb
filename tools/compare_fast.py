#!/usr/bin/env python3
"""Vectorized twin of compare_local.py for the large-SF sweeps.

Same CLI, same pass/fail semantics, same cell normalization rules as
compare_local.py (floats %.6f, None/NaN -> NULL, timestamps isoformat,
everything else str()) — but the canonical form is built with numpy
column-at-a-time instead of a Python loop over rows, and the multiset
comparison sorts one joined string per row instead of a tuple. At sf10
a 15M-row compare drops from ~850 s to under a minute, which is the
difference between the full-inventory sweep fitting in a round or not.

Kept separate from compare_local.py on purpose: compare_local.py is the
byte-for-byte replica of the driver's gate and stays boring; parity of
this file against it is proven by running both over the full sf0.01
inventory (see SURVEY §6) before any sweep trusts the fast path.
"""
import atexit
import json
import math
import os
import shutil
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

SEP = "\x01"


def norm_cell(v):
    # Identical to compare_local.norm_cell — the object-dtype fallback.
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def norm_col(s: pd.Series) -> np.ndarray:
    """One normalized string per cell, matching norm_cell semantics."""
    kind = s.dtype.kind
    if kind == "f":
        arr = s.to_numpy()
        nan = np.isnan(arr)
        out = np.char.mod("%.6f", np.where(nan, 0.0, arr))
        out[nan] = "NULL"
        return out
    if kind in "iu":
        return s.to_numpy().astype(str)
    if kind == "b":
        # str(True) == 'True' — np bool astype(str) matches.
        return s.to_numpy().astype(str)
    if kind == "M":
        # pd.Timestamp.isoformat(): fractional part only when nonzero,
        # trimmed like datetime.isoformat. No vector shortcut reproduces
        # that trimming exactly, so go through Timestamps per row — this
        # is still far cheaper than the generic per-cell isinstance
        # chain, and timestamp columns are rare in wide outputs.
        return np.array(
            ["NULL" if pd.isna(v) else v.isoformat() for v in s], dtype=object)
    # object / nullable: full fallback (handles None, numpy scalars via
    # str(), dates, lists).
    return np.array([norm_cell(v) for v in s], dtype=object)


def canon(df: pd.DataFrame) -> np.ndarray:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return np.array([], dtype=object)
    cols = [norm_col(df[c]) for c in df.columns]
    joined = cols[0].astype(object)
    for c in cols[1:]:
        joined = joined + SEP
        joined = joined + c.astype(object)
    return np.sort(joined)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # Scale sweeps run several compares beside a live Spark Verify JVM;
    # unbounded DuckDB threads (= all 32 cores per process) would thrash.
    threads = os.environ.get("DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    mem = os.environ.get("DUCKDB_MEMORY_LIMIT")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    # Per-process spill dir: concurrent compares sharing one cwd would
    # otherwise all write .tmp/duckdb_temp_storage-N.tmp and clobber
    # each other's spill (observed in the r13 sf10 sweep as IO errors,
    # aborts and one GPF once several oracles spilled at once).
    # Removed on exit so repeated sweeps don't accumulate stale spill
    # dirs under .tmp/ (crash leftovers included — rmtree, not rmdir).
    tmp = f".tmp/duckdb_{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    atexit.register(shutil.rmtree, tmp, True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 4 and sys.argv[3] == "--only":
        only = set(sys.argv[4].split(","))
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if len(a) != len(b):
            print(f"FAIL {name}: row count spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        neq = a != b
        if neq.any():
            i = int(np.argmax(neq))
            print(f"FAIL {name}: {int(neq.sum())}/{len(a)} rows differ; first at {i}:")
            print(f"  cols : {sc}")
            print(f"  spark: {a[i].split(SEP)}")
            print(f"  duck : {b[i].split(SEP)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
