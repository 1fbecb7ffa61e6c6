#!/usr/bin/env bash
# Laplacian performance sweep (equivalent of the reference's
# scripts/perf_laplacian.sh, which compares hypre versions): runs the
# bench across grid sizes and stencils on the current chip and tabulates
# nnz/s + setup/solve times from the JSON lines.
#
#   ./perf_laplacian.sh [--n "32 48 64"] [--reps 2000] [--out perf.jsonl]
set -euo pipefail

SIZES="32 48 64"
REPS=2000
OUT="perf_laplacian.jsonl"
while [ $# -gt 0 ]; do
  case "$1" in
    --n) SIZES="$2"; shift 2 ;;
    --reps) REPS="$2"; shift 2 ;;
    --out) OUT="$2"; shift 2 ;;
    *) echo "unknown option $1"; exit 1 ;;
  esac
done

cd "$(dirname "$0")/.."
: > "${OUT}"
for NX in ${SIZES}; do
  echo "== nx=${NX} =="
  HYPREDRV_BENCH_NX=${NX} HYPREDRV_BENCH_REPS=${REPS} \
    python bench.py | tail -1 | tee -a "${OUT}"
done
echo "wrote ${OUT}"
python - "${OUT}" <<'PY'
import json, sys
print(f"{'nx':>6} {'spmv Gnnz/s':>12} {'vcycle Gnnz/s':>14} {'setup[s]':>9}")
for line in open(sys.argv[1]):
    d = json.loads(line)
    nx = d["extra"]["problem"].split()[1].split("^")[0]
    print(f"{nx:>6} {d['value']/1e9:>12.2f} "
          f"{d['extra']['amg_vcycle_nnz_per_s']/1e9:>14.2f} "
          f"{d['extra']['amg_setup_s']:>9.2f}")
PY
