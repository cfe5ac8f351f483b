#!/bin/bash
# Round-2 twelfth follow-up: benches with the followup11 verdicts applied
# — PALLAS_DFT default OFF (slower in composition + 2e-3 P(k) shift) and
# the RSD v2 path ON (wrap fused in-kernel, band-2/4 cond ladder, free
# maxdisp from the noise kernel's block maxima; 39.6 -> 23.4 ms at 512^3).
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== followup12 start $(date -u +%FT%TZ) ===="

echo "---- [0/2] tunnel probe ----"
timeout 900 python - <<'EOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
EOF
if [ $? -ne 0 ]; then
  echo "TPU probe FAILED — aborting followup12"
  echo "==== followup12 abort $(date -u +%FT%TZ) ===="
  exit 1
fi

echo "---- [1/2] 256^3 bench (RSD v2, einsum DFT) ----"
timeout 1800 python bench.py --verbose

echo "---- [2/2] 512^3 chained bench (RSD v2, einsum DFT) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 --verbose

echo "==== followup12 end $(date -u +%FT%TZ) ===="
