#!/bin/bash
# Round-2 seventh follow-up: find the 512^3 time (212 ms/realisation vs
# the >=5/s = 200 ms bar).  Scaling the 256^3 numbers accounts for only
# ~70 ms of matmul-DFT work, so most of the budget is elsewhere:
#   1. per-stage profile at 512^3 (scripts/profile_512.py)
#   2. mmfft stage-split sweep at N=512, HIGHEST only (is (2,256) best?)
# Sequential: the TPU is single-process-exclusive.  Appends to the log.
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== followup7 start $(date -u +%FT%TZ) ===="

echo "---- [0/2] tunnel probe ----"
timeout 900 python - <<'EOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
EOF
if [ $? -ne 0 ]; then
  echo "TPU probe FAILED — aborting followup7"
  echo "==== followup7 abort $(date -u +%FT%TZ) ===="
  exit 1
fi

echo "---- [1/2] 512^3 per-stage profile ----"
timeout 3600 env NSAMP=512 K=4 python scripts/profile_512.py

echo "---- [2/2] mmfft split sweep at 512 (HIGHEST) ----"
timeout 3600 env MM_FACTORS=1 MM_NSAMP=512 MM_K=4 \
  MM_SPLITS="512;2,256;4,128;8,64" MM_PRECS="HIGHEST" \
  python scripts/microbench_mmfft.py

echo "==== followup7 end $(date -u +%FT%TZ) ===="
