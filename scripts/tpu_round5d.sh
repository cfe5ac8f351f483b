#!/bin/bash
# Round-5 campaign D: max-N envelope with the fixed probe (box capped at
# 8 Gpc so frequency channels stay positive) and the round-5 kernels
# (lane-padded binned-pk, any-C fused RSD).  Each cell is a fresh
# subprocess with untruncated logs.
set -u
cd /root/repo
LOG=scripts/round5d.log
: > "$LOG"
say() { echo "=== $*" | tee -a "$LOG"; }

say "maxN 576+640+704 signal/pipeline (fixed box, round-5 kernels)"
timeout 10800 python scripts/probe_maxN.py --sizes 576 640 704 \
  --modes signal pipeline --out MAXN_R5.json >> "$LOG" 2>&1
say "exit: $?"

say "maxN 768 pipeline (expect HBM OOM; record precisely)"
timeout 3600 python scripts/probe_maxN.py --sizes 768 --modes pipeline \
  --out MAXN_768_R5.json >> "$LOG" 2>&1
say "exit: $?"
say "done"
