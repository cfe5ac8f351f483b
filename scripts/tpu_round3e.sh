#!/bin/bash
# Round-3 campaign E: the round3d steps lost to the mid-run script edit,
# plus the fixes found: lattice microbench (input shapes corrected), COLA
# steady-state timing, 512^3 chain sweep, max-N probe, box_muller draw
# bench + its own 256^3 truth gate, fisher notebook (attr typo fixed).
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== round3e start $(date -u +%FT%TZ) ===="

echo "---- [0/8] tunnel probe ----"
timeout 900 python - <<'PYEOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
PYEOF
[ $? -ne 0 ] && { echo "TPU probe FAILED — aborting round3e"; exit 1; }

echo "---- [1/8] lattice-CIC kernel microbench (fixed shapes) ----"
timeout 2400 env NSAMP=128 python scripts/microbench_lattice.py
timeout 2400 env NSAMP=256 python scripts/microbench_lattice.py

echo "---- [2/8] COLA 256^3 steady-state timing ----"
timeout 3600 python scripts/probe_cola_disp.py --nsamp 256 --box 4000 --repeat 3

echo "---- [3/8] 512^3 chain sweep (5, 6) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 5 --verbose
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 6 --verbose

echo "---- [4/8] box_muller draw-method bench (256^3 + 512^3) ----"
timeout 1800 python bench.py --draw-method box_muller --verbose
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 \
    --draw-method box_muller --verbose

echo "---- [5/8] box_muller truth at 256^3 (CPU, f64+f32 on the bm stream) ----"
timeout 10800 env JAX_PLATFORMS=cpu python scripts/truth_gate.py truth \
    --nsamp 256 --box 4e3 --draw-method box_muller \
    --out truth_gate_256_bm.npz

echo "---- [6/8] box_muller truth-gate check on TPU ----"
timeout 3600 python scripts/truth_gate.py check \
    --truth truth_gate_256_bm.npz --variants bm_draw \
    --out TRUTH_GATE_256_BM.json

echo "---- [7/8] fisher notebook (TPU executed) ----"
timeout 3600 python scripts/make_notebooks.py --only fisher --out examples/notebooks

echo "---- [8/8] single-chip maximum-N probe ----"
timeout 7200 python scripts/probe_maxN.py

echo "==== round3e end $(date -u +%FT%TZ) ===="
