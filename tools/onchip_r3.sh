#!/bin/bash
# Round-3 on-chip measurement batch. Run from /root/repo when the axon
# tunnel is healthy. Sequential one-process-per-measurement (a failed/
# OOM'd axon executable never frees its buffers in-process), generous
# per-step timeouts (every new program costs ~25-60 s remote compile).
# Results append to tools/onchip_r3.log as JSON lines.
set -u
cd /root/repo
LOG=tools/onchip_r3.log
echo "=== onchip_r3 $(date -u +%FT%TZ) ===" >> "$LOG"

step() {
  local name=$1; shift
  echo "--- $name $(date -u +%T) ---" | tee -a "$LOG"
  timeout "$1" "${@:2}" > /tmp/onchip_step.out 2>&1
  local rc=$?
  grep -v "^W" /tmp/onchip_step.out | tail -20 | tee -a "$LOG"
  echo "rc=$rc $name done $(date -u +%T)" | tee -a "$LOG"
}

# 1. real-chip regression tier (compiled seam kernels vs jnp)
step tpu-tier 3600 python -m pytest tests/test_tpu.py --tpu -q

# 2. GF32 encode seam A/B at the headline config
step rs-off  900 python -m fastecc_tpu.cli rs-bench --lg-k 19 --lanes 1024 --iters 3 --seam off
step rs-auto 900 python -m fastecc_tpu.cli rs-bench --lg-k 19 --lanes 1024 --iters 3 --seam auto

# 3. GF16 encode seam A/B at the bench config (k=2^13, 2^15 lanes)
step rs16-off  900 python -m fastecc_tpu.cli --field gf16 rs-bench --lg-k 13 --lanes 32768 --iters 3 --seam off
step rs16-auto 900 python -m fastecc_tpu.cli --field gf16 rs-bench --lg-k 13 --lanes 32768 --iters 3 --seam auto

# 4. decode seam A/B at the headline decode config
step dec-off  1200 python -m fastecc_tpu.cli decode-bench --lg-n 20 --lg-e 19 --lanes 512 --iters 3 --seam off
step dec-auto 1200 python -m fastecc_tpu.cli decode-bench --lg-n 20 --lg-e 19 --lanes 512 --iters 3 --seam auto

# 5. the full headline bench (seam auto-dispatch = production).
# --no-probe: this script only runs when the tunnel is already verified
# healthy, so skip bench.py's subprocess backend pre-flight (~40 s).
step bench 2400 python bench.py --no-probe

echo "=== onchip_r3 complete $(date -u +%FT%TZ) ===" | tee -a "$LOG"
