"""Pallas binned-P(k) kernel on real TPU: correctness vs XLA path + timing."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_fastbox"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.ops.pallas.binned_pk import binned_pk_pallas
from fastbox_tpu.ops.reduce import binned_sum_sumsq_count

def bench(name, f, *args, n=10):
    t0=time.perf_counter(); o=f(*args); jax.block_until_ready(o); tc=time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(n): o=f(*args)
    jax.block_until_ready(o)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms (compile {tc:.1f}s)", flush=True)
    return o

N = 256
grid = GridSpec.create(box_scale=(4e3,)*3, nsamp=N)
key = jax.random.PRNGKey(0)
pk3d = jax.random.uniform(key, (N,N,N), jnp.float32)
kx, ky, kz = grid.kvec(jnp.float32)
edges = jnp.asarray(np.logspace(np.log10(grid.kmin), np.log10(grid.kmax), 20), jnp.float32)

o_p = bench("pallas binned_pk 256^3", jax.jit(lambda p: binned_pk_pallas(p, kx**2, ky**2, kz**2, edges**2)), pk3d)

kmag = grid.kmag(jnp.float32)
idx = jnp.searchsorted(edges, kmag.ravel(), side="right")
o_r = bench("scan-matmul binned reduce", jax.jit(lambda p: binned_sum_sumsq_count(p.ravel(), idx, 20)), pk3d)

for a, b, name in zip(o_p, o_r, ("sum","sumsq","count")):
    a, b = np.asarray(a), np.asarray(b)
    rel = np.max(np.abs(a-b)/np.maximum(np.abs(b),1e-9))
    print(f"{name}: max rel diff = {rel:.2e}")
