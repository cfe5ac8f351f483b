#!/bin/bash
# Round-2 follow-up TPU measurements (run AFTER tpu_campaign.sh):
#  1. bench.py default — now takes the fused Pallas binned-P(k) path
#     (pallas_pk=auto): headline rate + regression guard.
#  2. Pallas-vs-XLA-vs-host-f64 P(k) accuracy of the new dual kernel.
#  3. mmfft precision sweep (HIGH vs HIGHEST) + factor-split sweep.
#  4. bench_matrix at --mm-precision HIGH (does fft_pair/prefer_mm win
#     with 3-pass matmuls?).
# One process at a time; appends to scripts/tpu_campaign.log.
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== followup start $(date -u +%FT%TZ) ===="

echo "---- [1/4] bench.py default (pallas_pk auto) ----"
timeout 1800 python bench.py --nsamp 256 --iters 10 --verbose

echo "---- [2/4] pallas dual-kernel accuracy on TPU ----"
timeout 1200 python - <<'EOF'
import os, time
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
import jax.numpy as jnp
import numpy as np
from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.pipeline import PipelineConfig, make_pipeline

grid = GridSpec.create(box_scale=(4e3,)*3, nsamp=256, redshift=0.8)
cosmo = build_cosmology(dict(Omega_c=0.25, Omega_b=0.05, h=0.7,
                             n_s=0.95, sigma8=0.8), redshift=0.8)
key = jax.random.PRNGKey(5)
out_p = make_pipeline(grid, cosmo, PipelineConfig(pallas_pk="on"))(key)
out_x = make_pipeline(grid, cosmo, PipelineConfig(pallas_pk="off"))(key)
pk_p = np.asarray(out_p["pk_cleaned"]); pk_x = np.asarray(out_x["pk_cleaned"])
m = np.isfinite(pk_x) & (pk_x != 0)
print("pallas-vs-xla pk max rel dev:",
      float(np.max(np.abs(pk_p[m]/pk_x[m] - 1.0))), flush=True)

# Host-f64 truth on the SAME half-spectrum power cube
from fastbox_tpu.ops.pallas.binned_pk import binned_pk_half_dual_pallas
from fastbox_tpu.ops import spectra as sp
H = grid.N//2 + 1
x = jax.random.normal(jax.random.PRNGKey(9), (grid.N,)*3, jnp.float32)
ah = jnp.fft.rfftn(x)
p = jax.jit(lambda a: (a*jnp.conj(a)).real)(ah)
kx, ky, kz = grid.kvec(jnp.float32)
kzh = kz[:H]
wz = np.full(H, 2.0, np.float32); wz[0]=1.0; wz[-1]=1.0
edges = jnp.asarray(sp.default_kbins(grid, 20), jnp.float32)
s1,q1,s2,cw = binned_pk_half_dual_pallas(p, p, kx**2, ky**2, kzh**2,
                                         jnp.asarray(wz), edges)
ph = np.asarray(p, np.float64)
km = np.sqrt(np.asarray(kx,np.float64)[:,None,None]**2
             + np.asarray(ky,np.float64)[None,:,None]**2
             + np.asarray(kzh,np.float64)[None,None,:]**2)
idx = np.searchsorted(np.asarray(edges,np.float64), km.ravel(), side="right")
w3 = np.broadcast_to(wz.astype(np.float64)[None,None,:], ph.shape).ravel()
pv = ph.ravel()
for name, dev, ref in (
    ("sum", np.asarray(s1,np.float64),
     np.bincount(idx, w3*pv, minlength=21)[:20]),
    ("sumsq", np.asarray(q1,np.float64),
     np.bincount(idx, w3*pv*pv, minlength=21)[:20]),
    ("wcount", np.asarray(cw,np.float64),
     np.bincount(idx, w3, minlength=21)[:20]),
):
    nz = ref != 0
    print(f"pallas dual {name} max rel err vs f64 host:",
          float(np.max(np.abs(dev[nz]/ref[nz] - 1.0))), flush=True)
EOF

echo "---- [3/4] mmfft precision + factor sweeps ----"
timeout 1800 python scripts/microbench_mmfft.py --nsamp 256
timeout 1800 env MM_HALF=1 python scripts/microbench_mmfft.py
timeout 1800 env MM_FACTORS=1 MM_NSAMP=256 python scripts/microbench_mmfft.py

echo "---- [4/4] bench matrix at HIGH matmul precision ----"
timeout 2400 python scripts/bench_matrix.py --nsamp 256 --iters 8 \
    --chains 8 --mm-precision HIGH

echo "==== followup end $(date -u +%FT%TZ) ===="
