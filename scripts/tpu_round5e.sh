#!/bin/bash
# Round-5 campaign E: COLA with the round-5 kernel policy.
#   1. 512^3 COLA — first-ever measurement (ladder capped at B=2, exact
#      scatter fallback beyond; fuse B=1; LATTICE_512.json policy)
#   2. 256^3 COLA re-artifact with the fused-all-bands default (1.63 s
#      in the probe) so BENCH_COLA_r05.json records the shipping engine
set -u
cd /root/repo
LOG=scripts/round5e.log
: > "$LOG"
say() { echo "=== $*" | tee -a "$LOG"; }

say "COLA 512^3 first measurement (round-5 policy)"
timeout 7200 python scripts/bench_cola.py --nsamp 512 --box 8000 \
  --repeat 2 --out BENCH_COLA_512_r05.json >> "$LOG" 2>&1
say "exit: $?"

say "COLA 256^3 shipping-default artifact (fused all bands)"
timeout 3600 python scripts/bench_cola.py --nsamp 256 --box 4000 \
  --repeat 3 --out BENCH_COLA_r05.json >> "$LOG" 2>&1
say "exit: $?"
say "done"
