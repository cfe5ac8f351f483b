#!/bin/bash
# Round-2 third follow-up: everything still pending after the 08:59Z
# followup was cut short mid-[3/4]:
#   1. bench.py default 256^3 — first measurement of the lane-aligned
#      Pallas binned-P(k) layout (commit fd13fef).
#   2. Pallas dual-kernel accuracy/timing + hoisted-weight lattice-CIC
#      B=2/B=3 op timings (followup2 step 2).
#   3. COLA 256^3 wall-clock with the hoisted CIC kernels (followup2 step 3).
#   4. bench_matrix at HIGH matmul precision (followup1 step 4, never ran).
#   5. 512^3 chained bench (CLAUDE.md: remeasure with chain + fft_pair).
# Sequential: the TPU is single-process-exclusive. Appends to the log.
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== followup3 start $(date -u +%FT%TZ) ===="

echo "---- [0/5] tunnel probe ----"
timeout 900 python - <<'EOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
EOF
if [ $? -ne 0 ]; then
  echo "TPU probe FAILED — aborting followup3"
  echo "==== followup3 abort $(date -u +%FT%TZ) ===="
  exit 1
fi

echo "---- [1/5] bench.py 256^3 (lane-aligned pallas pk) ----"
timeout 1800 python bench.py --nsamp 256 --iters 10 --verbose

echo "---- [2/5] pallas pk accuracy + lattice CIC timing ----"
timeout 2400 python - <<'EOF'
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

from fastbox_tpu.ops.pallas.binned_pk import binned_pk_half_dual_pallas
from fastbox_tpu.ops import spectra as sp
H = grid.N//2 + 1
x = jax.random.normal(jax.random.PRNGKey(9), (grid.N,)*3, jnp.float32)
p = jax.jit(lambda x: (lambda a: (a*jnp.conj(a)).real)(jnp.fft.rfftn(x)))(x)
kx, ky, kz = grid.kvec(jnp.float32)
kzh = kz[:H]
wz = np.full(H, 2.0, np.float32); wz[0]=1.0; wz[-1]=1.0
edges = jnp.asarray(sp.default_kbins(grid, 20), jnp.float32)
f = jax.jit(lambda p: binned_pk_half_dual_pallas(
    p, p, kx**2, ky**2, kzh**2, jnp.asarray(wz), edges))
s1,q1,s2,cw = f(p)
t0=time.perf_counter()
for _ in range(20): o = f(p)
jax.block_until_ready(o); np.asarray(o[0])
print(f"pallas dual kernel 256^3: {(time.perf_counter()-t0)/20*1000:.2f} ms",
      flush=True)
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

from fastbox_tpu.ops.pallas.lattice_cic import (cic_paint_lattice_pallas,
                                                cic_gather_lattice_pallas)
N = 256
d = jax.random.uniform(jax.random.PRNGKey(1), (N,N,N,3), jnp.float32,
                       -1.9, 1.9)
mesh = jax.random.normal(jax.random.PRNGKey(2), (N,N,N), jnp.float32)
for B in (2, 3):
    fp = jax.jit(lambda d: cic_paint_lattice_pallas(d, B=B))
    fg = jax.jit(lambda m, d: cic_gather_lattice_pallas(m, d, B=B))
    out = fp(d); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(10): out = fp(d)
    jax.block_until_ready(out); np.asarray(out[0,0,:2])
    print(f"paint  B={B}: {(time.perf_counter()-t0)/10*1000:.2f} ms", flush=True)
    out = fg(mesh, d); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(10): out = fg(mesh, d)
    jax.block_until_ready(out); np.asarray(out[0,0,:2])
    print(f"gather B={B}: {(time.perf_counter()-t0)/10*1000:.2f} ms", flush=True)
EOF

echo "---- [3/5] COLA 256^3 timing (hoisted CIC) ----"
timeout 2400 python - <<'EOF'
import os, time
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
import jax.numpy as jnp
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

echo "---- [4/5] bench matrix at HIGH matmul precision ----"
timeout 2400 python scripts/bench_matrix.py --nsamp 256 --iters 8 \
    --chains 8 --mm-precision HIGH

echo "---- [5/5] 512^3 chained bench ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 --verbose

echo "==== followup3 end $(date -u +%FT%TZ) ===="
