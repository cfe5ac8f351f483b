"""Per-stage TPU profile of the 512^3 pipeline (tunnel-safe timing).

The 512^3 chained bench sits at 4.705 pipelines/s (212 ms/realisation,
followup6) against the >=5/s round-2 bar.  Scaling the 256^3 numbers
accounts for only ~70 ms of matmul-DFT work, so most of the budget is in
the non-FFT stages — this script times each pipeline component in
isolation at NSAMP^3 to find it.

Timing rules (CLAUDE.md): chain K ops inside one jit with data
dependencies and hard-sync via np.asarray on a scalar; block_until_ready
returns early through the axon tunnel.

Run from the repo root:  NSAMP=512 python scripts/profile_512.py
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

from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.fields import gaussian, transforms
from fastbox_tpu.filters import pca_filter
from fastbox_tpu.filters.pca import pca_filter_subspace
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.models import noise as noise_mod
from fastbox_tpu.models.foregrounds import ForegroundModel, gaussian_smooth_wrap
from fastbox_tpu.ops import mmfft, rsd as rsd_ops, spectra as spectra_ops
from fastbox_tpu.ops.pallas.binned_pk import binned_pk_half_dual_pallas

N = int(os.environ.get("NSAMP", "512"))
K = int(os.environ.get("K", "4"))
H = N // 2 + 1
DT = jnp.float32

grid = GridSpec.create(box_scale=(4e3,) * 3, nsamp=N, redshift=0.8)
cosmo = build_cosmology(
    dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8), 0.8)
Hz = 100.0 * cosmo.h * cosmo.Ea


def timed(name, fn, args, k, n=3):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / (n * k)
    print(f"{name:40s} {dt * 1000:8.2f} ms/op   (compile+warm {tc:.1f}s)",
          flush=True)
    return dt


key = jax.random.PRNGKey(0)
kxv, kyv, kzv = grid.kvec(DT)
kz_half = kzv[:H]

# Shared inputs built once on device
x = jax.random.normal(key, (N, N, N), DT)
ah = jax.jit(mmfft.rfftn3)(x)
np.asarray(jnp.real(ah[0, 0, :1]))
print(f"== {N}^3 stage profile (K={K}) ==", flush=True)


# --- (a) the three big 3D matmul DFTs (HIGHEST, the shipping default)
@jax.jit
def inv_chain(a):
    y = a
    for _ in range(K):
        r = mmfft.irfftn3(y, (N, N, N))
        y = y * (1.0 + 1e-12 * jnp.mean(r))
    return jnp.mean(r)


@jax.jit
def fwd_chain(x):
    y = x
    for _ in range(K):
        a = mmfft.rfftn3(y)
        y = y * (1.0 + 1e-12 * jnp.mean(jnp.real(a)))
    return jnp.mean(jnp.abs(jnp.real(a[0, 0, :2])))


timed("mmfft irfftn3 HIGHEST", inv_chain, (ah,), K)
timed("mmfft rfftn3  HIGHEST", fwd_chain, (x,), K)


# --- (b) half-spectrum noise draw
@jax.jit
def noise_chain(key):
    s = jnp.complex64(0.0)
    for i in range(K):
        w = gaussian.hermitian_half_noise(jax.random.fold_in(key, i), grid, DT)
        s = s + w[0, 0, 0] + w[-1, -1, -1]
    return jnp.real(s)


timed("hermitian_half_noise", noise_chain, (key,), K)


# --- (c) lognormal (exp-heavy elementwise)
@jax.jit
def ln_chain(x):
    y = x
    for _ in range(K):
        y = transforms.lognormal(y * 0.1)
    return jnp.mean(y)


timed("lognormal", ln_chain, (x,), K)


# --- (d) RSD remap (default linear method + sigma_nl draw)
vz = jax.jit(lambda a: mmfft.irfftn3(a * jnp.complex64(0.01), (N, N, N)))(ah)
np.asarray(vz[:1, 0, 0])


@jax.jit
def rsd_chain(d, v, key):
    y = d
    for i in range(K):
        r = rsd_ops.redshift_space_density(
            y, v, grid, Hz, sigma_nl=120.0,
            key=jax.random.fold_in(key, i), method="linear")
        y = y * (1.0 + 1e-12 * jnp.mean(r))
    return jnp.mean(r)


timed("rsd (linear, sigma_nl)", rsd_chain, (x, vz, key), K)


# --- (e) foreground cube construction (2D GRFs + freq power law)
freqs = grid.freq_array(cosmo)
ang_x, _ = grid.pixel_array(cosmo)
dang = ang_x[1] - ang_x[0]
fg_sigma_pix = 4.0 / dang
alpha_sigma_pix = 15.0 / dang
freqs_j = jnp.asarray(freqs.copy(), DT)


@jax.jit
def fg_chain(key):
    s = jnp.float32(0.0)
    for i in range(K):
        kf1, kf2, ka = jax.random.split(jax.random.fold_in(key, i), 3)
        white2d = (jax.random.normal(kf1, (N, N), DT)
                   + 1j * jax.random.normal(kf2, (N, N), DT))
        fg_map = ForegroundModel.foreground_amp_from_whitenoise(
            white2d, grid, cosmo.chi, 57.0, 1.1, 10.0, fg_sigma_pix)
        alpha = 2.07 + 2e-4 * jax.random.normal(ka, (N, N), DT)
        alpha = gaussian_smooth_wrap(alpha, alpha_sigma_pix)
        cube = ForegroundModel.construct_cube_fn(fg_map, alpha, freqs_j, 130.0)
        s = s + jnp.mean(cube)
    return s


timed("foreground cube (2D GRF + powerlaw)", fg_chain, (key,), K)


# --- (f) radiometer noise add
sigma_rms = noise_mod.radiometer_sigma(freqs, ang_x, 18.0, 2.0, 1.0, 64)
sigma_j = jnp.asarray(sigma_rms, DT)


@jax.jit
def noiseadd_chain(d, key):
    y = d
    for i in range(K):
        y = rsd_ops.add_scaled_normal(y, sigma_j, jax.random.fold_in(key, i))
        y = y * 0.999
    return jnp.mean(y)


timed("add_scaled_normal (radiometer)", noiseadd_chain, (x, key), K)


# --- (g) PCA clean: exact eigh vs subspace iteration, plus raw pieces
@jax.jit
def pca_chain(d):
    y = d
    for _ in range(K):
        c = pca_filter(y, 4)
        y = y * (1.0 + 1e-12 * jnp.mean(c))
    return jnp.mean(c)


@jax.jit
def pcas_chain(d):
    y = d
    for _ in range(K):
        c = pca_filter_subspace(y, 4)
        y = y * (1.0 + 1e-12 * jnp.mean(c))
    return jnp.mean(c)


timed("pca_filter (exact eigh)", pca_chain, (x,), K)
timed("pca_filter_subspace", pcas_chain, (x,), K)

C0 = jax.jit(lambda d: (lambda m: m.T @ m / (N * N))(d.reshape(N * N, N)))(x)
np.asarray(C0[:1, 0])


@jax.jit
def eigh_chain(C):
    y = C
    for _ in range(K):
        w, V = jnp.linalg.eigh(y)
        y = y * (1.0 + 1e-12 * jnp.mean(w))
    return jnp.mean(w)


@jax.jit
def cov_chain(d):
    y = d.reshape(N * N, N)
    s = jnp.float32(0.0)
    for _ in range(K):
        C = y.T @ y
        s = s + C[0, 0]
        y = y * (1.0 + 1e-12 * C[0, 0])
    return s


timed("  eigh(NxN) alone", eigh_chain, (C0,), K)
timed("  covariance GEMM alone", cov_chain, (x,), K)


# --- (h) binned P(k): fused Pallas dual kernel
edges = jnp.asarray(np.asarray(spectra_ops.default_kbins(grid, 20)), DT)
kzw = np.full(H, 2.0, dtype=np.float64)
kzw[0] = 1.0
if N % 2 == 0:
    kzw[-1] = 1.0
kzw_j = jnp.asarray(kzw, DT)
p1 = jax.jit(lambda a: (a * jnp.conj(a)).real)(ah)
np.asarray(p1[:1, 0, 0])


@jax.jit
def pk_chain(p1):
    y = p1
    for _ in range(K):
        s1, q1, s2, cnt = binned_pk_half_dual_pallas(
            y, y, kxv ** 2, kyv ** 2, kz_half ** 2, kzw_j, edges,
            interpret=jax.default_backend() != "tpu")
        y = y * (1.0 + 1e-12 * s1[0])
    return s1[0]


timed("binned_pk dual (pallas)", pk_chain, (p1,), K)


# --- (i) the full chained pipeline for reference (cache-hot from bench)
from fastbox_tpu.pipeline import PipelineConfig, make_chained_pipeline

fn_c = make_chained_pipeline(grid, cosmo, PipelineConfig())
keys = jax.random.split(key, K)
timed("FULL pipeline (chained)", lambda ks: fn_c(ks)["pk_cleaned"],
      (keys,), K, n=2)
