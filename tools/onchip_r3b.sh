#!/bin/bash
# Round-3 continuation on-chip batch: the measurements the first r3
# session did not finish (tools/onchip_r3.log ends mid "dec-auto-newsplit")
# plus the real-chip regression tier, all with the retuned pair split
# (_pair_default_c: shallow c1 above 2^16) now the default.
# Run from /root/repo when the axon tunnel is healthy; results append to
# tools/onchip_r3.log as JSON lines.
set -u
cd /root/repo
LOG=tools/onchip_r3.log
echo "=== onchip_r3b $(date -u +%FT%TZ) ===" >> "$LOG"

step() {
  local name=$1; shift
  echo "--- $name $(date -u +%T) ---" | tee -a "$LOG"
  timeout "$1" "${@:2}" > /tmp/onchip_step.out 2>&1
  local rc=$?
  grep -v "^W" /tmp/onchip_step.out | tail -20 | tee -a "$LOG"
  echo "rc=$rc $name done $(date -u +%T)" | tee -a "$LOG"
}

# 1. decode seam A/B at the headline decode config (cut off last session)
step dec-off  1200 python -m fastecc_tpu.cli decode-bench --lg-n 20 --lg-e 19 --lanes 512 --iters 3 --seam off
step dec-auto 1200 python -m fastecc_tpu.cli decode-bench --lg-n 20 --lg-e 19 --lanes 512 --iters 3 --seam auto

# 2. real-chip regression tier (compiled seam kernels vs jnp)
step tpu-tier 3600 python -m pytest tests/test_tpu.py --tpu -q

echo "=== onchip_r3b complete $(date -u +%FT%TZ) ===" | tee -a "$LOG"
