#!/bin/bash
# Round-4 campaign B: the DEFAULT-tier (single-pass bf16) DFT frontier.
# With fg_spectral='poly' the former dominant cleaned-P(k) error is gone
# (1.26e-3 shipping), so the DEFAULT tier on the delta_x inverse and the
# cleaned-cube forward — never gated post-poly — may now be admissible.
# HIGH->DEFAULT cuts each transform's matmul cost ~3x: the candidate
# single lever for BOTH VERDICT #2 (256^3 >=105/s) and #4 (512^3 >=10/s).
# Strictly serialized (TPU is single-process-exclusive), one process per
# step (a failed op poisons the client).
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== round4b start $(date -u +%FT%TZ) ===="

echo "---- [0/8] tunnel probe ----"
timeout 900 python - <<'PYEOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
PYEOF
[ $? -ne 0 ] && { echo "TPU probe FAILED — aborting round4b"; exit 1; }

echo "---- [1/8] truth gate 256^3: DEFAULT-tier variants ----"
timeout 5400 python scripts/truth_gate.py check --truth truth_gate_256.npz \
    --variants mm3d_default,dx_default,fwd_default \
    --out TRUTH_GATE_256_R4B.json

echo "---- [2/8] bench 256^3 mm3d=DEFAULT ----"
timeout 3600 python bench.py --nsamp 256 --iters 16 --mm3d-precision DEFAULT --verbose

echo "---- [3/8] bench 256^3 dx=DEFAULT (fwd stays HIGH) ----"
timeout 3600 python bench.py --nsamp 256 --iters 16 --dx-precision DEFAULT --verbose

echo "---- [4/8] bench 256^3 fwd=DEFAULT (dx stays HIGH) ----"
timeout 3600 python bench.py --nsamp 256 --iters 16 --fwd-precision DEFAULT --verbose

echo "---- [5/8] bench 256^3 incumbent control ----"
timeout 3600 python bench.py --nsamp 256 --iters 16 --verbose

echo "---- [6/8] bench 512^3 mm3d=DEFAULT chain=6 ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --mm3d-precision DEFAULT --chain 6 --verbose

echo "---- [7/8] bench 512^3 mm3d=DEFAULT chain=8 (optimum may shift with the lighter body) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --mm3d-precision DEFAULT --chain 8 --verbose

echo "---- [8/8] 256^3 per-stage budget at shipping defaults ----"
timeout 3600 env NSAMP=256 K=8 python scripts/profile_512.py

echo "==== round4b end $(date -u +%FT%TZ) ===="
