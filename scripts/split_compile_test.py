"""Compare monolithic vs split-jit pipeline: compile time + throughput."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.fields import gaussian, transforms
from fastbox_tpu.filters import pca_filter
from fastbox_tpu.models import noise as noise_mod
from fastbox_tpu.models.foregrounds import ForegroundModel, gaussian_smooth_wrap
from fastbox_tpu.ops import rsd as rsd_ops
from fastbox_tpu.ops import spectra as spectra_ops

N = 256
grid = GridSpec.create(box_scale=(4e3,)*3, nsamp=N, redshift=0.8)
cosmology = build_cosmology(dict(Omega_c=0.25,Omega_b=0.05,h=0.7,n_s=0.95,sigma8=0.8), 0.8)
dtype = jnp.float32
Hz = 100.0 * cosmology.h * cosmology.Ea
amp = jnp.sqrt(jnp.nan_to_num(cosmology.pk_nl(grid.kmag(dtype))) * jnp.asarray(grid.boxfactor, dtype))
kz = grid.kvec(dtype)[2]
k2 = grid.k2(dtype)
inv_k2 = jnp.where(k2>0, 1.0/jnp.where(k2>0,k2,1.0), 0.0)
vzw = (493.0 * kz[None,None,:] * inv_k2).astype(dtype)
nyq = grid.nyquist_mask(2)
freqs = grid.freq_array(cosmology)
ang_x, _ = grid.pixel_array(cosmology)
sig = jnp.asarray(noise_mod.radiometer_sigma(freqs, ang_x, 18., 2., 1., 64), dtype)
freqs_j = jnp.asarray(freqs.copy(), dtype)

def seg1(key):
    ks = jax.random.split(key, 5)
    white = gaussian.white_noise(ks[0], grid, dtype)
    dk = gaussian.hermitian_symmetrize(white * amp)
    dx = jnp.fft.ifftn(dk).real.astype(dtype)
    dln = transforms.lognormal(dx * 1.1)
    vz = jnp.fft.ifftn(jnp.where(nyq[None,None,:], 0., (1j*dk)*vzw)).real.astype(dtype)
    return dln, vz, ks

def seg2(dln, vz, key):
    return rsd_ops.redshift_space_density(dln, vz, grid, Hz, sigma_nl=120., key=key)

def seg3(ds, ks):
    data = 0.2*(1.0+ds)
    kf1, kf2 = jax.random.split(ks[2])
    w2 = (jax.random.normal(kf1,(N,N),dtype) + 1j*jax.random.normal(kf2,(N,N),dtype))
    fmap = ForegroundModel.foreground_amp_from_whitenoise(w2, grid, cosmology.chi, 57., 1.1, 10., 8.0)
    alpha = gaussian_smooth_wrap(2.07 + 2e-4*jax.random.normal(ks[3],(N,N),dtype), 30.0)
    data = data + ForegroundModel.construct_cube_fn(fmap, alpha, freqs_j, 130.)
    data = data + jax.random.normal(ks[4], grid.shape, dtype)*sig[None,None,:]
    data = pca_filter(data, 4)
    kc, p, e = spectra_ops.binned_power_spectrum(grid, delta_x=data)
    return p

j1 = jax.jit(seg1); j2 = jax.jit(seg2); j3 = jax.jit(seg3)
key = jax.random.PRNGKey(0)

t0=time.perf_counter(); o1 = j1(key); jax.block_until_ready(o1); print(f"seg1 compile {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter(); o2 = j2(o1[0], o1[1], o1[2][1]); jax.block_until_ready(o2); print(f"seg2 compile {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter(); o3 = j3(o2, o1[2]); jax.block_until_ready(o3); print(f"seg3 compile {time.perf_counter()-t0:.1f}s", flush=True)

def full(key):
    dln, vz, ks = j1(key)
    ds = j2(dln, vz, ks[1])
    return j3(ds, ks)

keys = jax.random.split(jax.random.PRNGKey(1), 10)
o = full(keys[0]); jax.block_until_ready(o)
t0=time.perf_counter()
outs=[full(k) for k in keys]
jax.block_until_ready(outs)
dt=time.perf_counter()-t0
print(f"split pipeline: {10/dt:.2f} pipelines/s ({dt/10*1000:.0f} ms each)", flush=True)
