#!/bin/bash
# Round-5 campaign C (VERDICT #7 + #8 + #6):
#   1. bf16-DFT debias experiment (calibrate + truth-gate)
#   2. mm3d=DEFAULT composition bench under the round-4d body
#   3. pltpu-PRNG draw re-bench under the round-4d body (256^3 + 512^3)
#   4. 512^3 driver artifact on shipping defaults (BENCH_512_r05.json)
set -u
cd /root/repo
LOG=scripts/round5c.log
: > "$LOG"
say() { echo "=== $*" | tee -a "$LOG"; }

say "debias experiment (calibrate 8 keys + gate at 256^3)"
timeout 5400 python scripts/debias_pk.py --truth truth_gate_256.npz \
  --out DEBIAS_GATE_256.json >> "$LOG" 2>&1
say "exit: $?"

say "bench mm3d=DEFAULT x2 (the 110-class number, r4d body)"
for i in 1 2; do
  timeout 3600 python bench.py --nsamp 256 --iters 10 \
    --mm3d-precision DEFAULT >> "$LOG" 2>&1
  say "exit run $i: $?"
done

say "bench pallas-draw=on (256^3, r4d body)"
timeout 3600 python bench.py --nsamp 256 --iters 10 \
  --pallas-draw on >> "$LOG" 2>&1
say "exit: $?"
say "bench pallas-draw=on (512^3)"
timeout 3600 python bench.py --nsamp 512 --iters 6 \
  --pallas-draw on >> "$LOG" 2>&1
say "exit: $?"

say "BENCH_512_r05.json on shipping defaults"
timeout 3600 python bench.py --nsamp 512 --iters 6 \
  --out-json BENCH_512_r05.json >> "$LOG" 2>&1
say "exit: $?"
say "done"
