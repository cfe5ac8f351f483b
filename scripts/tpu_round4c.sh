#!/bin/bash
# Round-4 campaign C: the admissible perf levers.
#  - eigh hoist (PipelineConfig.eigh_hoist): batched eigh between two
#    chain scans — algorithm-identical (f64 5e-13), needs the 256^3 gate
#    for the f32 reordering class + clean on/off benches.
#  - open-band lattice CIC (2B+1 offsets/axis under the strict ladder):
#    COLA steady-state + per-kernel microbench + fused gather3 probe
#    (ADVICE round-3: verify --fuse in-engine on TPU before documenting).
# Strictly serialized; one process per step.
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== round4c start $(date -u +%FT%TZ) ===="

echo "---- [0/9] tunnel probe ----"
timeout 900 python - <<'PYEOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
PYEOF
[ $? -ne 0 ] && { echo "TPU probe FAILED — aborting round4c"; exit 1; }

echo "---- [1/9] truth gate 256^3: eigh_hoist + exact-binning re-baseline ----"
timeout 5400 python scripts/truth_gate.py check --truth truth_gate_256.npz \
    --variants eigh_hoist,mm3d_high,vel_highest \
    --out TRUTH_GATE_256_R4C.json

echo "---- [2/9] bench 256^3 defaults (eigh_hoist auto=on) ----"
timeout 3600 python bench.py --nsamp 256 --iters 16 --verbose

echo "---- [3/9] bench 256^3 --eigh-hoist off (control) ----"
timeout 3600 python bench.py --nsamp 256 --iters 16 --eigh-hoist off --verbose

echo "---- [4/9] bench 512^3 chain=6 (hoist on) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 6 --verbose

echo "---- [5/9] bench 512^3 chain=4 (hoist shifts the live set) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 --verbose

echo "---- [6/9] lattice microbench: open-band vs closed (256^3, B=1,2,3) ----"
timeout 3600 env NSAMP=256 K=8 BANDS=1,2,3 VARIANTS=open \
    python scripts/microbench_lattice.py

echo "---- [7/9] COLA steady state (open-band strict ladder) ----"
timeout 3600 python scripts/probe_cola_disp.py --nsamp 256 --box 4000 --repeat 3

echo "---- [8/9] COLA fused 3-mesh gather (open-band, all bands) ----"
timeout 3600 python scripts/probe_cola_disp.py --nsamp 256 --box 4000 \
    --fuse 3 --repeat 3

echo "---- [9/9] COLA force-FFT HIGH (chaotic-amplified either way) ----"
timeout 3600 python scripts/probe_cola_disp.py --nsamp 256 --box 4000 \
    --fuse 3 --fft-precision HIGH --repeat 3

echo "---- [10/10] truth gate 512^3: ship the shipping config's own-size gate ----"
timeout 5400 python scripts/truth_gate.py check --truth truth_gate_512.npz \
    --variants mm3d_high,vel_default,vel_highest,eigh_hoist \
    --out TRUTH_GATE_512.json

echo "==== round4c end $(date -u +%FT%TZ) ===="
