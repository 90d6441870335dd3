#!/bin/bash
# Round-5 hardware queue (runs AFTER the flagship large_longform_r5c lane).
# One TPU + one CPU core: strictly serial, nothing else on the box.
cd /root/repo
L=.lanes

run() {
  name=$1; shift
  echo "=== LANE $name: $* ===" >> $L/driver.log
  "$@" > $L/$name.out 2> $L/$name.err
  echo "exit=$? $name" >> $L/status
  echo "--- $name done $(date -u +%H:%M:%S) ---" >> $L/driver.log
}

echo "r5 queue start $(date -u +%H:%M:%S)" >> $L/driver.log

# VERDICT #3: deviation ladder incl. the new f32 flash-KV cache mode
run deviation_r5 timeout 5400 python scripts/measure_serving_deviation.py \
    --batch 16 --knobs 1 --json $L/deviation_r5.json

# VERDICT #4: real device trace of the coarse train step
run trace_coarse timeout 3600 python scripts/trace_train.py \
    --stage coarse --batch 32 --accum 1 --steps 3

# MFU re-measurement with the accum=1 no-scan fast path
run mfu_coarse_r5   timeout 3600 python scripts/bench_train.py --stage coarse --batch 32 --accum 1 --json
run mfu_semantic_r5 timeout 3600 python scripts/bench_train.py --stage semantic --batch 32 --accum 1 --json
run mfu_fine_r5     timeout 3600 python scripts/bench_train.py --stage fine --batch 16 --accum 1 --json

# VERDICT #5: serving batch sweep with the current stack (flash int8 KV)
run batch_sweep_r5 timeout 7200 python scripts/bench_batch_sweep.py \
    --batches 32,64,128,192 --reps 4 --json

# VERDICT #6: pipelined-vs-serial long-form A/B on one chip
run pipelined_ab_r5 timeout 7200 python scripts/bench_pipelined_ab.py \
    --batch 64 --seconds 16 --reps 3 --json

echo "r5 queue complete $(date -u +%H:%M:%S)" >> $L/driver.log
