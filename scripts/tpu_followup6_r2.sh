#!/bin/bash
# Round-2 sixth follow-up:
#   followup5 recorded 256^3 at the honest HIGHEST defaults (72.87/s) but
#   512^3 still vmem-OOMed (scoped usage is ~17x the block, not ~4x —
#   budget now 1.1 MB -> nc=4 at 512^3), and the estimator check died the
#   same way.  Also new: per-call mm precision — MIX3D runs the three BIG
#   3D transforms at HIGH and the tiny FG 2D transforms at HIGHEST, to
#   test the hypothesis that the all-HIGH failure came through the
#   foreground path (FG is 100-1000x the signal).
#   1. 512^3 chained bench (re-fixed kernel).
#   2. 512^3 Pallas-vs-f64-host estimator check.
#   3. mm-precision gate incl. MIX3D at 256^3.
#   4. bench --mm3d-precision HIGH at 256^3 (the speed it would buy).
# Sequential: the TPU is single-process-exclusive.  Appends to the log.
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== followup6 start $(date -u +%FT%TZ) ===="

echo "---- [0/4] tunnel probe ----"
timeout 900 python - <<'EOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
EOF
if [ $? -ne 0 ]; then
  echo "TPU probe FAILED — aborting followup6"
  echo "==== followup6 abort $(date -u +%FT%TZ) ===="
  exit 1
fi

echo "---- [1/4] 512^3 chained bench (nc=4 kernel) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 --verbose

echo "---- [2/4] 512^3 Pallas-vs-f64-host estimator check ----"
timeout 2400 python - <<'EOF'
import os, jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
import jax.numpy as jnp
import numpy as np
import fastbox_tpu
fastbox_tpu.ensure_platform()
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.ops.pallas.binned_pk import binned_pk_half_dual_pallas

N = 512
grid = GridSpec.create(box_scale=(4e3,)*3, nsamp=N, redshift=0.8)
key = jax.random.PRNGKey(3)
H = N // 2 + 1
k1, k2 = jax.random.split(key)
p1 = jax.random.uniform(k1, (N, N, H), jnp.float32)
p2 = jax.random.uniform(k2, (N, N, H), jnp.float32)
kx, ky, kz = grid.kvec(jnp.float32)
kx2 = kx ** 2
ky2 = ky ** 2
kz2h = kz[:H] ** 2
wz = jnp.where((jnp.arange(H) == 0) | (jnp.arange(H) == H - 1), 1.0, 2.0
               ).astype(jnp.float32)
edges = jnp.asarray(np.logspace(np.log10(2e-3), np.log10(0.4), 18),
                    jnp.float32)
s1, q1, s2, cw = binned_pk_half_dual_pallas(p1, p2, kx2, ky2, kz2h, wz, edges)
s1 = np.asarray(s1, np.float64); cw = np.asarray(cw, np.float64)

# f64 host reference (the XLA one-hot scan is itself 1.5e-3 off in f32 —
# measured on CPU at 64^3 — so it cannot serve as the oracle here).  The
# ~540 MB download costs ~35 s through the tunnel; fine for a one-off.
p1h = np.asarray(p1, np.float64)
p2h = np.asarray(p2, np.float64)
# Mirror the kernel's f32 association exactly (kyz2 precomputed pairwise)
# so bin assignment of edge-straddling modes cannot differ.
kyz2 = (np.asarray(ky2, np.float32)[:, None]
        + np.asarray(kz2h, np.float32)[None, :])
kmag = np.sqrt(np.asarray(kx2, np.float32)[:, None, None]
               + kyz2[None].astype(np.float32), dtype=np.float32)
idx = np.searchsorted(np.asarray(edges, np.float32), kmag.ravel(), side="right")
w3 = np.broadcast_to(np.asarray(wz, np.float64)[None, None, :], p1h.shape).ravel()
nb = int(edges.shape[0])
ref_s1 = np.zeros(nb + 1); np.add.at(ref_s1, idx, w3 * p1h.ravel())
ref_cw = np.zeros(nb + 1); np.add.at(ref_cw, idx, w3)
good = ref_cw[:len(s1)] > 0
dev_s1 = np.max(np.abs(s1[good] - ref_s1[:len(s1)][good])
                / np.maximum(np.abs(ref_s1[:len(s1)][good]), 1e-30))
dev_cw = np.max(np.abs(cw[good] - ref_cw[:len(cw)][good])
                / ref_cw[:len(cw)][good])
print(f"512^3 pallas-vs-f64host: max rel dev s1={dev_s1:.3e} cw={dev_cw:.3e}",
      flush=True)
print("verdict:", "PASS" if max(dev_s1, dev_cw) < 1e-4 else "FAIL", flush=True)
EOF

echo "---- [3/4] mm-precision gate incl. MIX3D (256^3) ----"
timeout 2400 python scripts/check_mm_precision_pk.py --nsamp 256

echo "---- [4/4] bench --mm3d-precision HIGH (256^3) ----"
timeout 1800 python bench.py --mm3d-precision HIGH --verbose

echo "==== followup6 end $(date -u +%FT%TZ) ===="
