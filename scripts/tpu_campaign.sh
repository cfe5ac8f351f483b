#!/bin/bash
# Round-2 TPU measurement campaign: run everything pending in sequence,
# one process at a time (the TPU is single-process-exclusive), appending
# to scripts/tpu_campaign.log.  Safe to re-run; each stage is bounded.
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== campaign start $(date -u +%FT%TZ) ===="

echo "---- [1/6] TPU probe ----"
timeout 300 python -c "import jax; print(jax.devices())" || { echo "TPU DOWN"; exit 1; }

echo "---- [2/6] bench matrix 256^3 ----"
timeout 2400 python scripts/bench_matrix.py --nsamp 256 --iters 8 --chains 1,4,8

echo "---- [3/6] bench 512^3 (chain=2) ----"
timeout 2400 python bench.py --nsamp 512 --iters 3 --chain 2 --verbose

echo "---- [4/6] Pallas binned-P(k) f32 accuracy ----"
timeout 1200 python scripts/check_binned_pk_accuracy.py

echo "---- [5/6] COLA 256^3 timing ----"
timeout 2400 python - <<'EOF'
import os, time
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
import jax.numpy as jnp
import numpy as np
from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.fields.cola import realise_density_cola

grid = GridSpec.create(box_scale=(4e3,)*3, nsamp=256, redshift=0.0)
cosmo = build_cosmology(dict(Omega_c=0.25, Omega_b=0.05, h=0.7,
                             n_s=0.95, sigma8=0.8), redshift=0.0)
for trial in range(3):
    t0 = time.time()
    d, _ = realise_density_cola(jax.random.PRNGKey(trial), grid, cosmo,
                                keep_velocities=False)
    s = float(jnp.std(d))
    print(f"COLA 256^3 trial {trial}: {time.time()-t0:.2f}s std={s:.3f}",
          flush=True)
EOF

echo "---- [6/6] examples sweep ----"
timeout 7200 bash scripts/run_all_examples.sh

echo "==== campaign end $(date -u +%FT%TZ) ===="
