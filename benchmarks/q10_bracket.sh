#!/bin/bash
# Round-5 q10: flash dot precision at 512px e2e (flash = 31% of the step
# there) and in the stage-1 train step (flash fwd+bwd). Interleaved arms.
set -u
cd /root/repo
OUT=${OUT:-/tmp/q10_results.txt}
run_arm() {
  local name="$1"; shift
  echo "=== arm $name $(date +%H:%M:%S) ===" >&2
  local out line rc
  out=$(env JAX_PLATFORMS='' "$@" 2>/tmp/q10_arm_stderr.log)
  rc=$?
  line=$(printf '%s\n' "$out" | tail -1)
  if [ "$rc" -ne 0 ] || [ -z "$line" ]; then
    line="FAILED rc=$rc (see /tmp/q10_arm_stderr.log)"
  fi
  echo "$name $line" >> "$OUT"
  echo "$name $line" >&2
}
run_arm 512_f32#1    DPT_BENCH_RES=512 DPT_FLASH_DOTS=f32    python bench.py
run_arm 512_native#1 DPT_BENCH_RES=512 DPT_FLASH_DOTS=native python bench.py
run_arm 512_f32#2    DPT_BENCH_RES=512 DPT_FLASH_DOTS=f32    python bench.py
run_arm 512_native#2 DPT_BENCH_RES=512 DPT_FLASH_DOTS=native python bench.py
run_arm ts_f32#1     DPT_FLASH_DOTS=f32    python benchmarks/trainstep_bench.py
run_arm ts_native#1  DPT_FLASH_DOTS=native python benchmarks/trainstep_bench.py
run_arm ts_f32#2     DPT_FLASH_DOTS=f32    python benchmarks/trainstep_bench.py
run_arm ts_native#2  DPT_FLASH_DOTS=native python benchmarks/trainstep_bench.py
echo "=== q10 done $(date +%H:%M:%S) ===" >&2
