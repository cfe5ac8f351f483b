#!/bin/bash
# Round-2 thirteenth follow-up: Box-Muller pairing in the noise kernel
# (both outputs used -> half the PRNG/transcendental cost per value;
# different-but-equivalent stream).
#   1. kernel statistics + determinism on hardware
#   2. 256^3 bench
#   3. 512^3 chained bench
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== followup13 start $(date -u +%FT%TZ) ===="

echo "---- [0/3] tunnel probe ----"
timeout 900 python - <<'EOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
EOF
if [ $? -ne 0 ]; then
  echo "TPU probe FAILED — aborting followup13"
  echo "==== followup13 abort $(date -u +%FT%TZ) ===="
  exit 1
fi

echo "---- [1/3] kernel statistics on hardware ----"
timeout 1800 python scripts/tpu_kernel_checks.py

echo "---- [2/3] 256^3 bench ----"
timeout 1800 python bench.py --verbose

echo "---- [3/3] 512^3 chained bench ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 --verbose

echo "==== followup13 end $(date -u +%FT%TZ) ===="
