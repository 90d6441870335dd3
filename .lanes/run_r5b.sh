#!/bin/bash
# Round-5b: validate the batch-128 headline through the FULL bench.py path
# (short clip + long-form w/ CLAP text + batch-1 latency + stage rates).
cd /root/repo
L=.lanes
run() {
  name=$1; shift
  echo "=== LANE $name: $* ===" >> $L/driver.log
  "$@" > $L/$name.out 2> $L/$name.err
  echo "exit=$? $name" >> $L/status
  echo "--- $name done $(date -u +%H:%M:%S) ---" >> $L/driver.log
}
echo "r5b queue start $(date -u +%H:%M:%S)" >> $L/driver.log
run bench_b128_r5 timeout 7200 env BENCH_LATENCY=1 BENCH_STRICT=1 python bench.py
echo "r5b queue complete $(date -u +%H:%M:%S)" >> $L/driver.log
