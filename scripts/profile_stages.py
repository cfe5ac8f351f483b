import time, jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fastbox")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.fields import gaussian, transforms
from fastbox_tpu.ops import rsd as rsd_ops, spectra as spectra_ops
from fastbox_tpu.filters import pca_filter

N=256
grid = GridSpec.create(box_scale=(4e3,)*3, nsamp=N, redshift=0.8)
cosmo = build_cosmology(dict(Omega_c=0.25,Omega_b=0.05,h=0.7,n_s=0.95,sigma8=0.8), 0.8)
key = jax.random.PRNGKey(0)

def bench(name, f, *args, n=3):
    t0=time.perf_counter()
    o = f(*args); jax.block_until_ready(o)
    tc = time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(n):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:8.1f} ms   (compile {tc:.1f}s)", flush=True)
    return o

f_draw = jax.jit(lambda k: gaussian.white_noise(k, grid, jnp.float32))
white = bench("white_noise", f_draw, key)
f_field = jax.jit(lambda w: gaussian.gaussian_field_from_whitenoise(w, grid, cosmo.pk_nl))
dx, dk = bench("gaussian_field (2 FFT)", f_field, white)
f_fft = jax.jit(lambda x: jnp.fft.fftn(x))
bench("single fftn c64", f_fft, dx.astype(jnp.complex64))
f_vel = jax.jit(lambda d: jnp.fft.ifftn(gaussian.realise_velocity(d, grid, cosmo)[2]).real)
vz = bench("velocity_z (+1 FFT)", f_vel, dk)
f_ln = jax.jit(lambda x: transforms.lognormal(x))
dln = bench("lognormal", f_ln, dx)
Hz = 100*cosmo.h*cosmo.Ea
f_rsd = jax.jit(lambda d, v: rsd_ops.redshift_space_density(d, v, grid, Hz, sigma_nl=120., key=key))
ds = bench("rsd", f_rsd, dln, vz)
f_pca = jax.jit(lambda d: pca_filter(d, 4))
cl = bench("pca_filter", f_pca, ds)
f_pk2 = jax.jit(lambda d: spectra_ops.binned_power_spectrum(grid, delta_k=d))
bench("binned_pk (no FFT)", f_pk2, dk)
