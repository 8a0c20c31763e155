#!/bin/bash
# Round-4 q8: flash 12MB score budget on top of the winning dense_2d=off
# default, interleaved with off anchors. ONE JAX process at a time.
set -u
cd /root/repo
OUT=${OUT:-/tmp/q8_results.txt}
run_arm() {
  local name="$1"; shift
  echo "=== arm $name $(date +%H:%M:%S) ===" >&2
  local out line rc
  out=$(env JAX_PLATFORMS='' "$@" python bench.py 2>/tmp/q8_arm_stderr.log)
  rc=$?
  line=$(printf '%s\n' "$out" | tail -1)
  if [ "$rc" -ne 0 ] || [ -z "$line" ]; then
    line="FAILED rc=$rc (see /tmp/q8_arm_stderr.log)"
  fi
  echo "$name $line" >> "$OUT"
  echo "$name $line" >&2
}
run_arm flash12_off#1 DPT_DENSE2D=off DPT_FLASH_SCORE_MB=12 DPT_FLASH_VMEM_MB=64
run_arm off#a1        DPT_DENSE2D=off
run_arm flash12_off#2 DPT_DENSE2D=off DPT_FLASH_SCORE_MB=12 DPT_FLASH_VMEM_MB=64
run_arm off#a2        DPT_DENSE2D=off
echo "=== q8 done $(date +%H:%M:%S) ===" >&2
