#!/bin/bash
# Round-4 q7 bracket: dense_2d all/proj/off e2e + flash 12MB score-budget
# e2e arms, interleaved to cancel tunnel drift. ONE JAX process at a time.
# Results appended as "<arm> <json>" lines to $OUT.
set -u
cd /root/repo
OUT=${OUT:-/tmp/q7_results.txt}
run_arm() {
  local name="$1"; shift
  echo "=== arm $name $(date +%H:%M:%S) ===" >&2
  local out line rc
  out=$(env JAX_PLATFORMS='' "$@" python bench.py 2>/tmp/q7_arm_stderr.log)
  rc=$?
  line=$(printf '%s\n' "$out" | tail -1)
  if [ "$rc" -ne 0 ] || [ -z "$line" ]; then
    line="FAILED rc=$rc (see /tmp/q7_arm_stderr.log)"
  fi
  echo "$name $line" >> "$OUT"
  echo "$name $line" >&2
}
run_arm proj#1 DPT_DENSE2D=proj
run_arm off#1  DPT_DENSE2D=off
run_arm proj#2 DPT_DENSE2D=proj
run_arm all#1  DPT_DENSE2D=all
run_arm proj#3 DPT_DENSE2D=proj
# flash score budget 12MB (needs VMEM limit raised), on top of proj
run_arm flash12_proj#1 DPT_DENSE2D=proj DPT_FLASH_SCORE_MB=12 DPT_FLASH_VMEM_MB=64
run_arm flash12_proj#2 DPT_DENSE2D=proj DPT_FLASH_SCORE_MB=12 DPT_FLASH_VMEM_MB=64
run_arm proj#4 DPT_DENSE2D=proj
echo "=== bracket done $(date +%H:%M:%S) ===" >&2
