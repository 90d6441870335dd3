#!/bin/bash
# Round-4 phase 2d: flagship large lane (with chunked fine windows) first,
# then the deviation ladder and the coarse MFU sweeps.
cd /root/repo
L=.lanes

run() {
  name=$1; shift
  echo "=== LANE $name: $* ===" >> $L/driver.log
  "$@" > $L/$name.out 2> $L/$name.err
  echo "exit=$? $name" >> $L/status
  echo "--- $name done $(date -u +%H:%M:%S) ---" >> $L/driver.log
}

echo "r4 phase 2d start $(date -u +%H:%M:%S)" >> $L/driver.log

run large_longform_b32 env BENCH_MODEL=musiclm_large BENCH_BATCH=32 BENCH_REPS=2 BENCH_LATENCY=1 BENCH_STRICT=1 python bench.py

# final one-methodology snapshot of the other stages with the optimized code
run mfu_semantic_v2 python scripts/bench_train.py --stage semantic --batch 32 --accum 1 --json
run mfu_fine_v2     python scripts/bench_train.py --stage fine --batch 16 --accum 1 --json

# small-model headline with the round-4 serving-kernel changes in place
run small_headline env BENCH_LATENCY=1 python bench.py

echo "r4 phase 2d complete $(date -u +%H:%M:%S)" >> $L/driver.log
