#!/bin/bash
# Round-5 campaign B (VERDICT #3 + #5 + #6 + missing notebook):
#   1. COLA 256^3 driver artifact (BENCH_COLA_r05.json)
#   2. B=3 fused 3-mesh gather retry (127 MB scoped-VMEM limit)
#   3. COLA 512^3: first-ever measurement + health validation
#   4. max-N: 576^3 untruncated-log probes; 640^3 full-pipeline stage bisect
#   5. execute the 4th notebook (Example_end_to_end_analysis)
# Sequential: the TPU is single-process-exclusive.
set -u
cd /root/repo
LOG=scripts/round5b.log
: > "$LOG"
say() { echo "=== $*" | tee -a "$LOG"; }

say "COLA 256^3 artifact (engine-default fuse<=2)"
timeout 3600 python scripts/bench_cola.py --nsamp 256 --box 4000 \
  --repeat 3 --out BENCH_COLA_r05.json >> "$LOG" 2>&1
say "exit: $?"

say "COLA 256^3 fused B=3 (fuse=99, 127MB limit)"
timeout 3600 python scripts/probe_cola_disp.py --nsamp 256 --box 4000 \
  --fuse 99 --repeat 3 >> "$LOG" 2>&1
say "exit: $?"

say "COLA 512^3 (first measurement; engine defaults)"
timeout 5400 python scripts/bench_cola.py --nsamp 512 --box 8000 \
  --repeat 2 --out BENCH_COLA_512_r05.json >> "$LOG" 2>&1
say "exit: $?"

say "maxN 576^3 signal+pipeline with untruncated logs"
timeout 5400 python scripts/probe_maxN.py --sizes 576 \
  --modes signal pipeline --out MAXN_576_R5.json >> "$LOG" 2>&1
say "exit: $?"

say "maxN 640^3 full-pipeline stage bisect"
timeout 3600 python scripts/probe_maxN.py --sizes 640 --modes pipeline \
  --tag full --out MAXN_640_full.json >> "$LOG" 2>&1
say "exit full: $?"
timeout 3600 python scripts/probe_maxN.py --sizes 640 --modes pipeline \
  --tag fg_only --extra '{"include_noise": false}' \
  --out MAXN_640_fg.json >> "$LOG" 2>&1
say "exit fg_only: $?"
timeout 3600 python scripts/probe_maxN.py --sizes 640 --modes pipeline \
  --tag noise_only --extra '{"include_foregrounds": false}' \
  --out MAXN_640_noise.json >> "$LOG" 2>&1
say "exit noise_only: $?"
timeout 3600 python scripts/probe_maxN.py --sizes 640 --modes pipeline \
  --tag pk_off --extra '{"pallas_pk": "off"}' \
  --out MAXN_640_pkoff.json >> "$LOG" 2>&1
say "exit pk_off: $?"

say "execute 4th notebook"
timeout 3600 python scripts/make_notebooks.py --only analysis >> "$LOG" 2>&1
say "exit: $?"
say "done"
