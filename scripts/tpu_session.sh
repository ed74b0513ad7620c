#!/bin/bash
# One TPU measurement session: wait for the device, then run every
# pending experiment sequentially (single process at a time — two
# concurrent TPU clients deadlock the remote tunnel; round-4 log).
# Usage: bash scripts/tpu_session.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/tpu_r4}
mkdir -p "$OUT"

probe() {
  timeout 100 python -c "import jax,numpy as np; x=jax.device_put(np.ones((8,128),np.float32)); assert float(x.sum())==1024.0" 2>/dev/null
}

echo "[session] waiting for device..." >&2
until probe; do
  echo "[session] $(date +%H:%M:%S) still unreachable" >&2
  sleep 120
done
echo "[session] device up at $(date +%H:%M:%S)" >&2

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "[session] === $name ===" >&2
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  echo "[session] $name rc=$? ($(date +%H:%M:%S))" >&2
}

# 1. profile the current (lane-join + flat-BBH) score path
run profile_score 900 python -u scripts/profile_score.py mycoplasma64
# 2. extract-phase split: bound matmuls vs full extraction
run extract_split 900 python -u scripts/extract_split_probe.py mycoplasma64
# 3. lane vs rotate join microbench
run lane_micro 900 python -u scripts/lane_join_micro.py mycoplasma64 1048576
# 4. signature-bucket sweep (extract+join tradeoff)
for B in 8192 16384 65536; do
  run "sweep_B$B" 900 env PT_SIG_BUCKETS=$B PT_TIMING=1 \
    python -u scripts/profile_score.py mycoplasma64
done
# 5. row-block sweep (bound-stage HBM traffic scales as 1/row_block)
for R in 512 1024; do
  run "sweep_R$R" 900 env PT_ROW_BLOCK=$R PT_TIMING=1 \
    python -u scripts/profile_score.py mycoplasma64
done
echo "[session] done" >&2
