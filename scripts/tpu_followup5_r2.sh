#!/bin/bash
# Round-2 fifth follow-up (after followup4):
#   followup4 found mm-precision HIGH FAILS the 1e-4 end-to-end P(k)
#   gate (5.3e-2 max rel dev) -> bench default reverted to HIGHEST, and
#   the 512^3 Pallas dual binned-P(k) kernel vmem-OOMed -> block capped
#   at 2.5 MB.  This run records the honest numbers:
#   1. bench.py at the reverted defaults (chain=8, HIGHEST) — the
#      BENCH_r02 configuration.
#   2. 512^3 chained bench with the fixed kernel.
#   3. 512^3 P(k)-estimator sanity: Pallas dual kernel vs XLA histogram
#      on the same cube (the vmem fix must not change results).
# Sequential: the TPU is single-process-exclusive.  Appends to the log.
cd "$(dirname "$0")/.." || exit 1
LOG=scripts/tpu_campaign.log
exec >>"$LOG" 2>&1
echo "==== followup5 start $(date -u +%FT%TZ) ===="

echo "---- [0/3] tunnel probe ----"
timeout 900 python - <<'EOF'
import os, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x*x).sum())(jnp.arange(8.0))), flush=True)
EOF
if [ $? -ne 0 ]; then
  echo "TPU probe FAILED — aborting followup5"
  echo "==== followup5 abort $(date -u +%FT%TZ) ===="
  exit 1
fi

echo "---- [1/3] bench.py reverted defaults (chain=8, HIGHEST) ----"
timeout 1800 python bench.py --verbose

echo "---- [2/3] 512^3 chained bench (vmem-fixed kernel) ----"
timeout 3600 python bench.py --nsamp 512 --iters 4 --chain 4 --verbose

echo "---- [3/3] 512^3 Pallas-vs-XLA P(k) estimator check ----"
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
from fastbox_tpu.ops import reduce as fred

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

echo "==== followup5 end $(date -u +%FT%TZ) ===="
