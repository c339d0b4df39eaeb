#!/bin/bash
# Safe-by-default skew-tier oracle sweep (r15 verdict task 4): compose
# ScaleGen --zipf, Verify, and compare_scale.py so a tier-GEOMETRY
# experiment can never grind the DuckDB side for an hour (the r15
# factor-4 × S=50 attempt: doc-pair oracles are copy-quadratic BY
# CONTRACT — 50²/8² ≈ 39× the established tier's pair work — and had to
# be hand-killed). Every oracle here runs under a wall budget
# (per-query subprocess timeout), a spill budget (DuckDB memory_limit +
# per-process temp dir via compare_fast.py), and the replicated-proof
# auto-fallback: a TIMEOUT/resource-failed key with an entry in
# tools/replication_proofs.json (the copy-quadratic doc-pair family)
# grades PASS-R through tools/compare_replicated.py against a
# SMALLER-factor anchor tier this script oracle-verifies FIRST at the
# same zipf S (ScaleGen construction: shared replicas of two factors at
# one S are row-identical, so prefix-equality/leakage/isomorphism are
# invariants of a correct scale-oblivious operator).
#
# Usage: tools/sweep_skew.sh <baseSfDir> <factor> <zipfS> <workDir> [keys]
#   keys: optional comma-separated SparkEntry.queries subset.
# Env knobs (all defaulted to safe values):
#   SWEEP_TIMEOUT   per-oracle wall budget seconds      (default 900)
#   SWEEP_PAR       concurrent oracle compares          (default 4)
#   DUCKDB_THREADS  threads per oracle process          (default 4)
#   DUCKDB_MEMORY_LIMIT  spill trigger per process      (default 16GB)
#   SWEEP_ANCHOR_FACTOR  the small anchor tier's factor (default 1)
#   SPARK_GRAFT_CPUS     Verify parallelism             (default 8)
#
# The r15 S=50 repro is exactly:
#   tools/sweep_skew.sh /root/testdata/sf0.01 4 50 /tmp/sweep_s50
# — the anchor (factor 1 × S=50) is oracle-feasible; at factor 4 any
# doc-pair oracle that exceeds the budgets completes via PASS-R instead
# of grinding. Artifact: <workDir>/SWEEP_RECORD.json (per-key
# status + oracle-vs-replicated path + wall).
#
# Requires compiled classes (sbt compile) — uses run_main.sh, which
# never takes the sbt lock.
set -euo pipefail
cd "$(dirname "$0")/.."

BASE="$1"; FACTOR="$2"; ZIPF="$3"; WORK="$4"; KEYS="${5:-}"
TIMEOUT="${SWEEP_TIMEOUT:-900}"
PAR="${SWEEP_PAR:-4}"
export DUCKDB_THREADS="${DUCKDB_THREADS:-4}"
export DUCKDB_MEMORY_LIMIT="${DUCKDB_MEMORY_LIMIT:-16GB}"
export COMPARE_SCRIPT="${COMPARE_SCRIPT:-tools/compare_fast.py}"
ANCHOR_FACTOR="${SWEEP_ANCHOR_FACTOR:-1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}"

mkdir -p "$WORK"
TIER="$WORK/tier_f${FACTOR}_s${ZIPF}"
ANCHOR="$WORK/tier_f${ANCHOR_FACTOR}_s${ZIPF}"
OUT_TIER="$WORK/out_f${FACTOR}_s${ZIPF}"
OUT_ANCHOR="$WORK/out_f${ANCHOR_FACTOR}_s${ZIPF}"

echo "== [1/5] anchor tier: factor $ANCHOR_FACTOR x zipf $ZIPF"
tools/run_main.sh graft.ScaleGen "$BASE" "$ANCHOR" "$ANCHOR_FACTOR" --zipf "$ZIPF"
echo "== [2/5] anchor Verify + STRICT oracle gate (the fallback's premise:"
echo "   the anchor output is fully oracle-verified before any proof uses it)"
tools/run_main.sh graft.Verify "$ANCHOR" "$OUT_ANCHOR" $KEYS
python3 tools/compare_scale.py "$ANCHOR" "$OUT_ANCHOR" "$TIMEOUT" "$PAR" --strict \
  --record "$WORK/ANCHOR_RECORD.json"

echo "== [3/5] target tier: factor $FACTOR x zipf $ZIPF"
tools/run_main.sh graft.ScaleGen "$BASE" "$TIER" "$FACTOR" --zipf "$ZIPF"
echo "== [4/5] target Verify"
tools/run_main.sh graft.Verify "$TIER" "$OUT_TIER" $KEYS
echo "== [5/5] budgeted oracle sweep with replicated-proof fallback"
python3 tools/compare_scale.py "$TIER" "$OUT_TIER" "$TIMEOUT" "$PAR" \
  --fallback "$OUT_ANCHOR:$ANCHOR_FACTOR:$FACTOR" \
  --record "$WORK/SWEEP_RECORD.json"
echo "sweep record: $WORK/SWEEP_RECORD.json"
