#!/usr/bin/env python3
"""Replication-invariant fallback for oracle-infeasible scale sweeps.

When a DuckDB oracle cannot run at sf10 on one box (spill larger than
disk — dedup_minhash_lsh needs >78 GB), the sweep still gets a
three-part proof, exploiting ScaleGen's construction: sfA (factor a)
and sfB (factor b > a) both derive from the SAME base tables with
identical per-replica key offsets (doc_id + r*1e8) and word salting,
so a correct scale-oblivious operator must satisfy:

  1. PREFIX EQUALITY — the sfB output restricted to replicas 0..a-1
     equals the sfA output EXACTLY (and the sfA output is cheap enough
     for the real DuckDB oracle — run that separately).
  2. ZERO LEAKAGE — no output row pairs ids from different replicas
     (ScaleGen salts text per replica so replicas share no content).
  3. REPLICA ISOMORPHISM — every replica's output, normalized by
     id mod 1e8, has the identical structure (one distinct md5 over
     the sorted normalized rows, one distinct row count).

Usage:
  python3 tools/compare_replicated.py <sfA_out> <sfB_out> <factorA> \
      [factorB] --key q --ids col1[,col2] [--scaled col:power] [--topk]

  --ids     id columns carrying the replica offset (checked for
            leakage when two are given; first defines the replica).
  --scaled  a column whose value scales as (corpus size)^power —
            e.g. q_assoc_rules lift scales linearly (power 1): the
            check divides it by (b/a)^power before comparing. May
            repeat. Columns not listed must match exactly.
  --topk    the output is a bounded top-k slice: a bigger corpus has
            MORE replicas of the best base rows, so the sfB slice is
            not a replica-prefix of sfA's — check 1 weakens to
            "every normalized sfB row appears among sfA's rows"
            (base-tuple subset), and check 3 (replica isomorphism) is
            SKIPPED: a top-k cut landing mid tie-group gives unequal
            per-replica counts even for a correct operator, so
            isomorphism is not an invariant of the sliced output.
            The factorB positional is REQUIRED (enforced) — the slice
            need not surface every replica, so inferring the factor
            from MAX(id)//OFF would bias the --scaled ratio.

Exit 0 iff all checks hold.
"""
import sys

import duckdb

OFF = 100000000


def main():
    key = ids = None
    scaled = {}
    topk = "--topk" in sys.argv
    args, skip = [], False
    for a in sys.argv[1:]:
        if skip:
            skip = False
        elif a == "--topk":
            pass
        elif a.startswith("--"):
            skip = True
        else:
            args.append(a)
    out_a, out_b, factor_a = args[0], args[1], int(args[2])
    argv = sys.argv
    for i in range(len(argv) - 1):
        if argv[i] == "--key":
            key = argv[i + 1]
        if argv[i] == "--ids":
            ids = argv[i + 1].split(",")
        if argv[i] == "--scaled":
            c, p = argv[i + 1].split(":")
            scaled[c] = float(p)
    if key is None or ids is None:
        sys.exit("usage error: --key and --ids are required")
    if topk and len(args) < 4:
        sys.exit("usage error: --topk requires the explicit factorB "
                 "positional (a sliced output need not surface every "
                 "replica, so it cannot be inferred)")
    con = duckdb.connect()
    con.execute("SET memory_limit='8GB'; SET threads=4")
    pa = f"'{out_a}/{key}/*.parquet'"
    pb = f"'{out_b}/{key}/*.parquet'"

    cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM {pb}").fetchall()]
    # factor ratio between the two scales, for --scaled normalization:
    # explicit 4th positional when given (REQUIRED for --topk, whose
    # output does not surface every replica), else inferred from the
    # max replica index present in the full output.
    if len(args) > 3:
        factor_b = int(args[3])
    else:
        factor_b = con.execute(
            f"SELECT 1 + MAX({ids[0]}) // {OFF} FROM {pb}").fetchone()[0]
    ratio = factor_b / factor_a

    def norm(c, for_b):
        if c in ids:
            return f"CAST({c} % {OFF} AS VARCHAR)"
        if c in scaled and for_b:
            return f"CAST(ROUND({c} / pow({ratio}, {scaled[c]}), 6) AS VARCHAR)"
        if c in scaled:
            return f"CAST(ROUND({c}, 6) AS VARCHAR)"
        return f"CAST({c} AS VARCHAR)"

    rowa = " || ':' || ".join(norm(c, False) for c in cols)
    rowb = " || ':' || ".join(norm(c, True) for c in cols)
    ok = True

    # 1. prefix equality (normalized rows, sfB replicas 0..a-1 vs sfA);
    #    with --topk, base-tuple subset instead (see module doc).
    #    MULTISET semantics: compare (row, COUNT(*)) pairs, not row
    #    sets — equal counts with equal row SETS could hide
    #    compensating multiplicity differences for outputs whose rows
    #    aren't key-unique (X twice + Y once vs X once + Y twice).
    if topk:
        na, nb_, d1 = con.execute(f"""
          WITH sa AS (SELECT {rowa} AS r FROM {pa}),
               sb AS (SELECT {rowb} AS r FROM {pb})
          SELECT (SELECT COUNT(*) FROM sa), (SELECT COUNT(*) FROM sb),
            (SELECT COUNT(*) FROM (SELECT r FROM sb EXCEPT SELECT r FROM sa))
        """).fetchone()
        if d1 != 0:
            ok = False
            print(f"FAIL {key}: {d1} top-k rows have no sfA base tuple "
                  f"(a={na} b={nb_})")
    else:
        pred = " AND ".join(f"{c} < {factor_a}*{OFF}" for c in ids)
        na, nb_, d1, d2 = con.execute(f"""
          WITH sa AS (SELECT {rowa} AS r, COUNT(*) AS n FROM {pa} GROUP BY 1),
               sb AS (SELECT {rowb} AS r, COUNT(*) AS n
                      FROM {pb} WHERE {pred} GROUP BY 1)
          SELECT (SELECT COALESCE(SUM(n), 0) FROM sa),
                 (SELECT COALESCE(SUM(n), 0) FROM sb),
            (SELECT COUNT(*) FROM (SELECT r, n FROM sb EXCEPT SELECT r, n FROM sa)),
            (SELECT COUNT(*) FROM (SELECT r, n FROM sa EXCEPT SELECT r, n FROM sb))
        """).fetchone()
        if not (na == nb_ and d1 == 0 and d2 == 0):
            ok = False
            print(f"FAIL {key}: prefix inequality a={na} b={nb_} diffs={d1}/{d2}")

    # 2. zero cross-replica leakage
    if len(ids) > 1:
        leak = con.execute(
            f"SELECT COUNT(*) FROM {pb} "
            f"WHERE {ids[0]} // {OFF} != {ids[1]} // {OFF}").fetchone()[0]
        if leak:
            ok = False
            print(f"FAIL {key}: {leak} cross-replica rows")

    # 3. replica isomorphism — NOT an invariant under --topk (a top-k
    #    cut landing mid tie-group gives unequal per-replica counts
    #    even for a correct operator), so skip it there.
    reps = "skipped(topk)"
    if not topk:
        reps, dn, dh = con.execute(f"""
          WITH per AS (
            SELECT {ids[0]} // {OFF} AS r, COUNT(*) AS n,
                   md5(string_agg({rowb}, ',' ORDER BY {rowb})) AS h
            FROM {pb} GROUP BY 1)
          SELECT COUNT(*), COUNT(DISTINCT n), COUNT(DISTINCT h) FROM per
        """).fetchone()
        if not (dn == 1 and dh == 1):
            ok = False
            print(f"FAIL {key}: replicas={reps} distinct_counts={dn} "
                  f"distinct_structures={dh}")

    if ok:
        print(f"PASS {key} (prefix={na} rows, replicas={reps}, ratio={ratio:g})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
