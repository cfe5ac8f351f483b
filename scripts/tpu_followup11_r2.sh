#!/bin/bash
# Round-2 ninth follow-up: validate the fused Pallas factored-DFT kernel
# (ops/pallas/mmdft.py, commit bdb52d2) in the real pipeline.
#   1. accuracy: 256^3 pipeline P(k), pallas-DFT on vs off, same key
#   2. 256^3 bench (new default path)
#   3. 512^3 chained bench
#   4. 512^3 FFT-row re-profile
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== followup11 start $(date -u +%FT%TZ) ===="

echo "---- [0/4] tunnel probe ----"
timeout 900 python - <<'EOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
EOF
if [ $? -ne 0 ]; then
  echo "TPU probe FAILED — aborting followup11"
  echo "==== followup11 abort $(date -u +%FT%TZ) ===="
  exit 1
fi

echo "---- [1/4] pallas-DFT on/off pipeline P(k) parity (256^3) ----"
timeout 2400 python - <<'EOF'
import os, jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
import numpy as np
import fastbox_tpu
fastbox_tpu.ensure_platform()
from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.pipeline import PipelineConfig, make_pipeline
from fastbox_tpu.ops import mmfft

grid = GridSpec.create(box_scale=(4e3,)*3, nsamp=256, redshift=0.8)
cosmo = build_cosmology(dict(Omega_c=0.25, Omega_b=0.05, h=0.7,
                             n_s=0.95, sigma8=0.8), 0.8)
key = jax.random.PRNGKey(42)
fn = make_pipeline(grid, cosmo, PipelineConfig())
pk_on = np.asarray(fn(key)["pk_cleaned"], np.float64)
mmfft.PALLAS_DFT = False
jax.clear_caches()
fn = make_pipeline(grid, cosmo, PipelineConfig())
pk_off = np.asarray(fn(key)["pk_cleaned"], np.float64)
dev = np.abs(pk_on - pk_off) / np.abs(pk_off)
print("pallas-DFT on/off pk max rel dev:", float(dev.max()), flush=True)
print("pallas-DFT on/off pk mean rel dev:", float(dev.mean()), flush=True)
print("verdict:", "PASS" if dev.max() < 1e-4 else "CHECK", flush=True)
EOF

echo "---- [2/4] 256^3 bench (pallas-DFT path) ----"
timeout 1800 python bench.py --verbose

echo "---- [3/4] 512^3 chained bench (pallas-DFT path) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 --verbose

echo "---- [4/4] 512^3 FFT-row re-profile ----"
timeout 3600 env NSAMP=512 K=4 python scripts/profile_512.py

echo "==== followup11 end $(date -u +%FT%TZ) ===="
