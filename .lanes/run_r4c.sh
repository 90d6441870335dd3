#!/bin/bash
# Round-4 phase 2c: corrected remainder of run_r4b (ab_env donation fix;
# the batch-64 large long-form lane HBM-OOMs — 24 layers x 216 MB fine-
# stage KV temps — so the flagship lane runs at batch 32).
cd /root/repo
L=.lanes

run() {
  name=$1; shift
  echo "=== LANE $name: $* ===" >> $L/driver.log
  "$@" > $L/$name.out 2> $L/$name.err
  echo "exit=$? $name" >> $L/status
  echo "--- $name done $(date -u +%H:%M:%S) ---" >> $L/driver.log
}

echo "r4 phase 2c start $(date -u +%H:%M:%S)" >> $L/driver.log

# flagship: musiclm_large 30/10/3 s windows, long-form 48 s + batch-1 latency
run large_longform_b32 env BENCH_MODEL=musiclm_large BENCH_BATCH=32 BENCH_REPS=2 BENCH_LATENCY=1 BENCH_STRICT=1 python bench.py

# training-step attribution (same-process interleaved A/B)
run ab_dropout_coarse  python scripts/bench_train.py --stage coarse --batch 16 --accum 1 --json --ab_env OPEN_MUSICLM_DISABLE_DROPOUT
run ab_threefry_coarse python scripts/bench_train.py --stage coarse --batch 16 --accum 1 --json --ab_env OPEN_MUSICLM_THREEFRY_DROPOUT
run ab_relpos_coarse   python scripts/bench_train.py --stage coarse --batch 16 --accum 1 --json --ab_env OPEN_MUSICLM_RELPOS_GATHER
run ab_pallas_coarse   python scripts/bench_train.py --stage coarse --batch 16 --accum 1 --json --ab_env OPEN_MUSICLM_PALLAS=0

# deviation ladder + logit-perturbation exceedance
run deviation_ladder python scripts/measure_serving_deviation.py --batch 16 --json /root/repo/.lanes/deviation_r4.json

# microbatch / param-dtype sweep toward >=35% coarse MFU
run coarse_b32       python scripts/bench_train.py --stage coarse --batch 32 --accum 1 --json
run coarse_b32_bf16  python scripts/bench_train.py --stage coarse --batch 32 --accum 1 --param_dtype bf16 --json

echo "r4 phase 2c complete $(date -u +%H:%M:%S)" >> $L/driver.log
