"""Elimination profile: pipeline runtime with stages toggled off.

Hard-syncs via np.asarray (block_until_ready can return early through the
axon remote-execution tunnel — see bench.py).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_fastbox"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.pipeline import PipelineConfig, make_pipeline

NS = int(os.environ.get("NSAMP", "256"))
grid = GridSpec.create(box_scale=(4e3,)*3, nsamp=NS, redshift=0.8)
cosmo = build_cosmology(dict(Omega_c=0.25,Omega_b=0.05,h=0.7,n_s=0.95,sigma8=0.8), 0.8)

def run(name, **kw):
    fn = make_pipeline(grid, cosmo, PipelineConfig(**kw))
    keys = jax.random.split(jax.random.PRNGKey(0), 12)
    out = fn(keys[0]); np.asarray(out["pk_cleaned"])
    t0 = time.perf_counter()
    outs = [fn(k) for k in keys[2:]]
    np.asarray(outs[-1]["pk_cleaned"])
    print(f"{name:34s} {(time.perf_counter()-t0)/10*1000:7.1f} ms", flush=True)

# The first measured config in a process runs ~4x slow (tunnel/runtime
# warm-up beyond compile), so burn one throwaway pass first.
run("(warm-up, ignore)")
run("full")
run("sigma_nl=0 (no rsd noise)", sigma_nl=0.0)
run("no foregrounds", include_foregrounds=False)
run("no noise", include_noise=False)
run("pca_nmodes=1", pca_nmodes=1)
run("pca subspace iteration", pca_exact=False)
run("nbins=8", nbins=8)
run("rsd_method=nearest", rsd_method="nearest")
