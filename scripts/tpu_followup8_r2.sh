#!/bin/bash
# Round-2 eighth follow-up: re-measure 512^3 with the dense (512,) DFT
# stage (followup7 sweep: 40.2 ms roundtrip vs 89.0 ms for the (2,256)
# peel — the inter-stage relayout dominated).  Expect the 4.705/s 512^3
# pipeline to clear the 5/s bar with ~50 ms/realisation back.
#   1. per-stage re-profile at 512^3 (FFT rows + FULL should drop)
#   2. 512^3 chained bench
#   3. 256^3 bench (defaults untouched — regression check)
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== followup8 start $(date -u +%FT%TZ) ===="

echo "---- [0/3] tunnel probe ----"
timeout 900 python - <<'EOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
EOF
if [ $? -ne 0 ]; then
  echo "TPU probe FAILED — aborting followup8"
  echo "==== followup8 abort $(date -u +%FT%TZ) ===="
  exit 1
fi

echo "---- [1/3] 512^3 per-stage re-profile (dense DFT stage) ----"
timeout 3600 env NSAMP=512 K=4 python scripts/profile_512.py

echo "---- [2/3] 512^3 chained bench ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 --verbose

echo "---- [3/3] 256^3 bench (regression check) ----"
timeout 1800 python bench.py --verbose

echo "==== followup8 end $(date -u +%FT%TZ) ===="
