#!/bin/bash
# Round-2 fourth follow-up (VM restart cut followup3 at step [5/5]):
#   1. End-to-end pk accuracy of mm-precision HIGH vs HIGHEST at 256^3
#      (gates the new bench.py default).
#   2. bench.py NEW defaults (chain=8, HIGH) — the number the driver will
#      record as BENCH_r02.
#   3. 512^3 chained bench (followup3 step 5, never completed).
#   4. COLA 256^3 at HIGH: timing + health stats (std, P/P_lin) to decide
#      whether the COLA examples can adopt HIGH too.
# Sequential: the TPU is single-process-exclusive.  Appends to the log.
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== followup4 start $(date -u +%FT%TZ) ===="

echo "---- [0/4] tunnel probe ----"
timeout 900 python - <<'EOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
EOF
if [ $? -ne 0 ]; then
  echo "TPU probe FAILED — aborting followup4"
  echo "==== followup4 abort $(date -u +%FT%TZ) ===="
  exit 1
fi

echo "---- [1/4] mm-precision HIGH end-to-end pk check ----"
timeout 2400 python scripts/check_mm_precision_pk.py --nsamp 256

echo "---- [2/4] bench.py new defaults (chain=8, HIGH) ----"
timeout 1800 python bench.py --verbose

echo "---- [3/4] 512^3 chained bench ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 --verbose

echo "---- [4/4] COLA 256^3 at HIGH: timing + health ----"
timeout 2400 env FASTBOX_MM_PRECISION=HIGH python - <<'EOF'
import os, time
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
import jax.numpy as jnp
import numpy as np
from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.fields.cola import realise_density_cola
from fastbox_tpu.ops import spectra

grid = GridSpec.create(box_scale=(4e3,)*3, nsamp=256, redshift=0.0)
cosmo = build_cosmology(dict(Omega_c=0.25, Omega_b=0.05, h=0.7,
                             n_s=0.95, sigma8=0.8), redshift=0.0)
for trial in range(3):
    t0 = time.time()
    d, _ = realise_density_cola(jax.random.PRNGKey(trial), grid, cosmo,
                                keep_velocities=False)
    kc, pk, _ = spectra.binned_power_spectrum(grid, delta_x=d)
    s = float(jnp.std(d))
    kc = np.asarray(kc); pk = np.asarray(pk)
    print(f"COLA 256^3 HIGH trial {trial}: {time.time()-t0:.2f}s "
          f"std={s:.3f}", flush=True)
    pk_lin = np.asarray(cosmo.pk_lin(jnp.asarray(kc)))
    sel = np.isfinite(pk) & (kc > 3e-3) & (kc < 2e-2) & (pk_lin > 0)
    print("  P/P_lin (large scales):",
          np.round(pk[sel]/pk_lin[sel], 3), flush=True)
EOF

echo "==== followup4 end $(date -u +%FT%TZ) ===="
