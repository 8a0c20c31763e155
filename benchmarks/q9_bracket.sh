#!/bin/bash
# Round-5 q9: flash dot-operand precision (f32 anchor vs native-bf16) and
# the 12MB score budget stacked on native, e2e bench.py arms interleaved to
# cancel tunnel drift. ONE JAX process at a time.
set -u
cd /root/repo
OUT=${OUT:-/tmp/q9_results.txt}
run_arm() {
  local name="$1"; shift
  echo "=== arm $name $(date +%H:%M:%S) ===" >&2
  local out line rc
  out=$(env JAX_PLATFORMS='' "$@" python bench.py 2>/tmp/q9_arm_stderr.log)
  rc=$?
  line=$(printf '%s\n' "$out" | tail -1)
  if [ "$rc" -ne 0 ] || [ -z "$line" ]; then
    line="FAILED rc=$rc (see /tmp/q9_arm_stderr.log)"
  fi
  echo "$name $line" >> "$OUT"
  echo "$name $line" >&2
}
run_arm f32#1      DPT_FLASH_DOTS=f32
run_arm native#1   DPT_FLASH_DOTS=native
run_arm native12#1 DPT_FLASH_DOTS=native DPT_FLASH_SCORE_MB=12 DPT_FLASH_VMEM_MB=64
run_arm f32#2      DPT_FLASH_DOTS=f32
run_arm native#2   DPT_FLASH_DOTS=native
run_arm native12#2 DPT_FLASH_DOTS=native DPT_FLASH_SCORE_MB=12 DPT_FLASH_VMEM_MB=64
echo "=== q9 done $(date +%H:%M:%S) ===" >&2
