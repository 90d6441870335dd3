#!/bin/bash
# Round-4 measurement campaign: one lane at a time on the single chip
# (concurrent lanes contaminate each other — BENCHMARKS.md hazards).
cd /root/repo
L=.lanes

run() {
  name=$1; shift
  echo "=== LANE $name: $* ===" >> $L/driver.log
  "$@" > $L/$name.out 2> $L/$name.err
  echo "exit=$? $name" >> $L/status
  echo "--- $name done $(date -u +%H:%M:%S) ---" >> $L/driver.log
}

: > $L/status
echo "r4 campaign start $(date -u +%H:%M:%S)" > $L/driver.log

# --- trustworthy training MFU, all stages, one methodology (VERDICT #2) ---
run mfu_semantic python scripts/bench_train.py --stage semantic --batch 32 --accum 1 --json
run mfu_coarse   python scripts/bench_train.py --stage coarse   --batch 16 --accum 1 --json
run mfu_fine     python scripts/bench_train.py --stage fine     --batch 16 --accum 1 --json

# --- 24-layer lane to completion, remat on and off (VERDICT #2) ---
run mfu_24L_remat python scripts/bench_train.py --stage semantic --model musiclm_large_small_context --remat 1 --batch 8 --accum 1 --json
run mfu_24L       python scripts/bench_train.py --stage semantic --model musiclm_large_small_context --remat 0 --batch 8 --accum 1 --json

# --- the flagship musiclm_large long-form number (VERDICT #1) ---
run large_longform env BENCH_MODEL=musiclm_large BENCH_REPS=2 BENCH_LATENCY=1 python bench.py

# --- on-the-fly tokenization pipeline bench (VERDICT #3) ---
run pipeline_semantic python scripts/bench_pipeline_train.py --stage semantic --batch 4 --accum 2 --json

# --- per-knob deviation attribution + margin sweep (VERDICT #4) ---
run deviation python scripts/measure_serving_deviation.py --batch 16 --json /root/repo/.lanes/deviation_r4.json

# --- serving admission on hardware (VERDICT #8) ---
run serve python scripts/bench_serve.py --batch 64 --json /root/repo/.lanes/serve_r4.json

echo "r4 campaign phase 1 complete $(date -u +%H:%M:%S)" >> $L/driver.log
