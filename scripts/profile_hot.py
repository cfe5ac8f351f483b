import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_fastbox"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.ops import rsd as rsd_ops, spectra as spectra_ops
from fastbox_tpu.fields import gaussian

def bench(name, f, *args, n=10):
    t0=time.perf_counter(); o=f(*args); jax.block_until_ready(o); tc=time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(n): o=f(*args)
    jax.block_until_ready(o)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:8.1f} ms (compile {tc:.1f}s)", flush=True)
    return o

N=256
grid = GridSpec.create(box_scale=(4e3,)*3, nsamp=N, redshift=0.8)
cosmo = build_cosmology(dict(Omega_c=0.25,Omega_b=0.05,h=0.7,n_s=0.95,sigma8=0.8), 0.8)
key = jax.random.PRNGKey(0)
dx, dk = gaussian.realise_density(key, grid, cosmo, dtype=jnp.float32)
jax.block_until_ready(dx)
vz = jax.jit(lambda d: jnp.fft.ifftn(d).real)( dk ).astype(jnp.float32)
Hz = 100*cosmo.h*cosmo.Ea
bench("rsd (new batched)", jax.jit(lambda a,b: rsd_ops.redshift_space_density(a,b,grid,Hz,sigma_nl=120.,key=key)), dx, vz)
bench("binned_pk from delta_k", jax.jit(lambda d: spectra_ops.binned_power_spectrum(grid, delta_k=d)[1]), dk)
bench("hermitian_symmetrize", jax.jit(gaussian.hermitian_symmetrize), dk)
bench("ifftn c64", jax.jit(lambda d: jnp.fft.ifftn(d)), dk)
# rfft comparison
xr = dx
bench("rfftn f32", jax.jit(lambda x: jnp.fft.rfftn(x)), xr)
bench("fftn c64 (from real)", jax.jit(lambda x: jnp.fft.fftn(x)), xr.astype(jnp.complex64))
