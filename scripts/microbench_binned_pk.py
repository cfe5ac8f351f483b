"""TPU microbench: binned_pk dual kernel v1 vs v2 (hoisted counts) vs
v2-telescoped, at NSAMP^3 half-spectrum shapes.

Timing rules (CLAUDE.md): K dependent reps inside one process, hard host
sync after each loop (block_until_ready returns early via the tunnel).

Run from the repo root:  NSAMP=512 K=8 python scripts/microbench_binned_pk.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import fastbox_tpu

fastbox_tpu.ensure_platform()

from fastbox_tpu.ops.pallas.binned_pk import binned_pk_half_dual_pallas
from fastbox_tpu.ops.pallas.binned_pk_v2 import binned_pk_half_dual_pallas_v2

N = int(os.environ.get("NSAMP", "256"))
K = int(os.environ.get("K", "8"))
H = N // 2 + 1
NB = 20

key = jax.random.PRNGKey(0)
p1 = jax.random.uniform(key, (N, N, H), jnp.float32, 0.1, 5.0)
p2 = p1 * 1.7 + 0.3
kx2 = jnp.asarray((np.fft.fftfreq(N) * N) ** 2, jnp.float32)
kz2 = jnp.asarray(np.arange(H, dtype=np.float64) ** 2, jnp.float32)
wz = jnp.asarray(np.where((np.arange(H) == 0) | (np.arange(H) == H - 1),
                          1.0, 2.0), jnp.float32)
edges = jnp.asarray(np.linspace(2.0, (N // 2) ** 2 * 2.2, NB), jnp.float32)


def timed(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(K):
        out = fn(*args)
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / K
    print(f"{name:38s} {dt * 1000:8.2f} ms/op  (compile+warm {tc:.1f}s)",
          flush=True)
    return out


a = timed("dual v1 (4-sum, in-kernel counts)",
          jax.jit(lambda x, y: binned_pk_half_dual_pallas(
              x, y, kx2, kx2, kz2, wz, edges)), p1, p2)
b = timed("dual v2 (3-sum, hoisted counts)",
          jax.jit(lambda x, y: binned_pk_half_dual_pallas_v2(
              x, y, kx2, kx2, kz2, wz, edges)), p1, p2)
c = timed("dual v2 telescoped",
          jax.jit(lambda x, y: binned_pk_half_dual_pallas_v2(
              x, y, kx2, kx2, kz2, wz, edges, telescoped=True)), p1, p2)

for i, nm in enumerate(("s1", "q1", "s2")):
    x, y, z = np.asarray(a[i]), np.asarray(b[i]), np.asarray(c[i])
    bit = "bit-identical" if np.array_equal(x, y) else \
        f"MISMATCH {np.max(np.abs(x - y)):.3e}"
    rel = np.max(np.abs(z - x) / np.maximum(np.abs(x), 1e-20))
    print(f"  {nm}: v2 {bit}; telescoped max rel {rel:.2e}", flush=True)
