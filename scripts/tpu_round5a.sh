#!/bin/bash
# Round-5 campaign A (VERDICT #1 + #2):
#   1. truth-gate vel_precision=HIGH (bf16x3 velocity inverse) at 256^3
#      and 512^3 alongside the incumbent (vel_default) and the accuracy
#      champion (vel_highest)
#   2. A/B bench vel HIGH vs DEFAULT at 256^3
#   3. 5-process run-to-run variance campaign on the shipping defaults
# Sequential: the TPU is single-process-exclusive.  Run from /root/repo,
# NO PYTHONPATH.
set -u
cd /root/repo
LOG=scripts/round5a.log
: > "$LOG"
say() { echo "=== $*" | tee -a "$LOG"; }

say "gate 256^3: vel_default / vel_high / vel_highest"
timeout 3600 python scripts/truth_gate.py check --truth truth_gate_256.npz \
  --variants vel_default,vel_high,vel_highest \
  --out TRUTH_GATE_256_R5.json >> "$LOG" 2>&1
say "gate 256 exit: $?"

say "gate 512^3: vel_default / vel_high"
timeout 3600 python scripts/truth_gate.py check --truth truth_gate_512.npz \
  --variants vel_default,vel_high \
  --out TRUTH_GATE_512_R5.json >> "$LOG" 2>&1
say "gate 512 exit: $?"

say "bench A/B at 256^3: vel DEFAULT (shipping) x2"
for i in 1 2; do
  timeout 3600 python bench.py --nsamp 256 --iters 10 --verbose >> "$LOG" 2>&1
  say "bench default run $i exit: $?"
done
say "bench A/B at 256^3: vel HIGH x2"
for i in 1 2; do
  timeout 3600 python bench.py --nsamp 256 --iters 10 --vel-precision HIGH \
    --verbose >> "$LOG" 2>&1
  say "bench vel-high run $i exit: $?"
done

say "variance campaign: 5 fresh processes, shipping defaults"
for i in 1 2 3 4 5; do
  timeout 3600 python bench.py --nsamp 256 --iters 10 >> "$LOG" 2>&1
  say "variance run $i exit: $?"
done
say "done"
