#!/bin/bash
# Round-4 phase 2: training-MFU attribution + sweep (after run_r4.sh).
# Each A/B lane is same-process interleaved (bench_train --ab_env); base is
# the NEW default (Toeplitz bias, rng_bit_generator dropout, Pallas attn),
# env1 re-enables the legacy behavior.
cd /root/repo
L=.lanes

run() {
  name=$1; shift
  echo "=== LANE $name: $* ===" >> $L/driver.log
  "$@" > $L/$name.out 2> $L/$name.err
  echo "exit=$? $name" >> $L/status
  echo "--- $name done $(date -u +%H:%M:%S) ---" >> $L/driver.log
}

echo "r4 phase 2 start $(date -u +%H:%M:%S)" >> $L/driver.log

# re-run the flagship long-form lane with the row-blocked fused-FF /
# int8-matmul kernels (the phase-1 lane hit the fused_ff scoped-VMEM OOM
# at 1280 decode rows; unchanged geometries hit the persistent compile
# cache). BENCH_STRICT makes any sub-lane failure fail the lane.
run large_longform_fixed env BENCH_MODEL=musiclm_large BENCH_REPS=2 BENCH_LATENCY=1 BENCH_STRICT=1 python bench.py

# attribution: what does each legacy behavior cost? (coarse = MFU target)
run ab_dropout_coarse  python scripts/bench_train.py --stage coarse --batch 16 --accum 1 --json --ab_env OPEN_MUSICLM_DISABLE_DROPOUT
run ab_threefry_coarse python scripts/bench_train.py --stage coarse --batch 16 --accum 1 --json --ab_env OPEN_MUSICLM_THREEFRY_DROPOUT
run ab_relpos_coarse   python scripts/bench_train.py --stage coarse --batch 16 --accum 1 --json --ab_env OPEN_MUSICLM_RELPOS_GATHER
run ab_pallas_coarse   python scripts/bench_train.py --stage coarse --batch 16 --accum 1 --json --ab_env OPEN_MUSICLM_PALLAS=0

# microbatch / param-dtype sweep toward >=35% coarse MFU
run coarse_b32       python scripts/bench_train.py --stage coarse --batch 32 --accum 1 --json
run coarse_b32_bf16  python scripts/bench_train.py --stage coarse --batch 32 --accum 1 --param_dtype bf16 --json

# deviation attribution re-run: the phase-1 lane's flash-kv-only variants
# silently measured the fp path (Stage.generate ignored flash_kv without
# quantized=True — now a loud error); the ladder variants measure each
# knob stacked on the int8-weights base
run deviation_ladder python scripts/measure_serving_deviation.py --batch 16 --json /root/repo/.lanes/deviation_r4.json

# per-stage decode rates AT the full 30 s / 1499-token semantic window
# (VERDICT r3 #1; the main large lane probes at output_seconds=10 -> 500)
run large_fullwindow env BENCH_MODEL=musiclm_large BENCH_SECONDS=30 BENCH_LONG_SECONDS=0 BENCH_REPS=2 python bench.py

echo "r4 phase 2 complete $(date -u +%H:%M:%S)" >> $L/driver.log
