"""End-to-end user-level smoke: the reference README flow on the live backend.

Run from anywhere: the repo root is added to sys.path directly (NOT via
PYTHONPATH, which breaks the axon TPU plugin — see .claude/skills/verify).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_fastbox"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from fastbox_tpu import CosmoBox, default_cosmo
from fastbox_tpu.models import ForegroundModel, NoiseModel, HITracer
import fastbox_tpu.filters as filters

box = CosmoBox(cosmo=default_cosmo, box_scale=(1e3,)*3, nsamp=64, redshift=0.8,
               realise_now=False, seed=10)
box.realise_density()
tracer = HITracer(box)
delta_hi = box.delta_x * tracer.bias_HI()
delta_ln = box.lognormal(delta_hi)
vel_k = box.realise_velocity(delta_x=box.delta_x)
vel_z = jnp.fft.ifftn(vel_k[2]).real
delta_s = box.redshift_space_density(delta_x=delta_ln, velocity_z=vel_z, sigma_nl=120.)
signal = tracer.signal_amplitude() * (1. + delta_s)
fg = ForegroundModel(box)
fg_map = fg.realise_foreground_amp(57., 1.1, 10., smoothing_scale=4.)
alpha = fg.realise_spectral_index(2.07, 2e-4, 15.)
fg_cube = fg.construct_cube(fg_map, alpha, freq_ref=130.)
noise = NoiseModel(box).realise_radiometer_noise(18., 2., 1., 64)
data = signal + fg_cube + noise
cleaned = filters.pca_filter(data, nmodes=4)
k, pk, err = box.binned_power_spectrum(delta_x=cleaned)
print("devices:", jax.devices())
print("signal std (mK): %.4f" % float(jnp.std(signal)))
print("fg cube mean (mK): %.2f  noise std (mK): %.4f" % (float(jnp.mean(fg_cube)), float(jnp.std(noise))))
print("data std: %.3f -> cleaned std: %.4f" % (float(jnp.std(data)), float(jnp.std(cleaned))))
print("P(k) head:", np.asarray(pk)[:4])
print("sigma8: %.4f" % box.sigma8())
s1, s2 = box.test_parseval()
# probes
try:
    CosmoBox(cosmo=[0.7, 0.3])
except TypeError as e:
    print("probe invalid-cosmo TypeError OK:", e)
from fastbox_tpu.ops import power_multipoles, correlation_function
pm = power_multipoles(box.grid, delta_s, second=jnp.asarray(box.delta_x))
print("probe cross P0 head:", np.asarray(pm["power_0"])[1:4])
cf = correlation_function(box.grid, jnp.asarray(box.delta_x), dr=10.)
print("probe xi(r) head:", np.asarray(cf["corr"])[:3])
