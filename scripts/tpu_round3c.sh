#!/bin/bash
# Round-3 campaign C: gate the bench knobs AT THE BENCH SIZE (256^3 truth
# oracle), probe the vel-precision knob, chain scaling, and the chipless
# TPU AOT memory analysis at 1024^3.
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== round3c start $(date -u +%FT%TZ) ===="

echo "---- [0/6] tunnel probe ----"
timeout 900 python - <<'PYEOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
PYEOF
[ $? -ne 0 ] && { echo "TPU probe FAILED — aborting round3c"; exit 1; }

echo "---- [1/6] truth-gate at 256^3 (bench-size admissibility) ----"
timeout 3600 python scripts/truth_gate.py check --truth truth_gate_256.npz \
  --variants mm_highest,mm3d_high,fft_pair_high,vel_default \
  --out TRUTH_GATE_256.json

echo "---- [2/6] 256^3 bench (chain 16, vel DEFAULT) ----"
timeout 1800 python bench.py --verbose --chain 16 --vel-precision DEFAULT

echo "---- [3/6] 256^3 bench (chain 32, exact) ----"
timeout 1800 python bench.py --verbose --chain 32

echo "---- [4/6] 512^3 bench (chain 4, vel DEFAULT) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 --verbose --vel-precision DEFAULT

echo "---- [5/6] 512^3 bench (chain 8, vel DEFAULT) ----"
timeout 3600 python bench.py --nsamp 512 --iters 2 --chain 8 --verbose --vel-precision DEFAULT

echo "---- [6/6] chipless TPU AOT: 1024^3 memory analysis ----"
timeout 3600 python scripts/compile_1024_tpu.py --nsamp 1024 --out SCALING_1024_TPU.json

echo "==== round3c end $(date -u +%FT%TZ) ===="
