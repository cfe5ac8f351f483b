#!/usr/bin/env python
"""Capture the REAL pipeline PCA covariance (and the pre-clean data cube's
frequency covariance) at the truth-gate configuration, on CPU.

Writes cov_256.npz with the f64 covariance of key 1000 at 256^3 — input
for scripts/probe_eigh_subspace.py --real, so the eigh-accuracy work runs
on the genuine spectral structure instead of a fabricated one.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main():
    import jax

    # NB: the JAX_PLATFORMS env var alone is NOT honoured once the axon
    # PJRT plugin is installed (measured 2026-08-20) — the config.update
    # call is what actually forces CPU.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_fastbox"))
    import jax.numpy as jnp

    import fastbox_tpu.pipeline as pl
    from fastbox_tpu.cosmology import build_cosmology
    from fastbox_tpu.grid import GridSpec

    nsamp = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    grid = GridSpec.create(box_scale=(4e3,) * 3, nsamp=nsamp, redshift=0.8)
    cosmology = build_cosmology(
        dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8),
        redshift=0.8)

    captured = {}

    orig = pl.pca_filter

    def spy(field, nmodes, return_filter=False):
        d = field.reshape((-1, field.shape[-1])).T
        x = d - jnp.mean(d, axis=-1, keepdims=True)
        cov = jnp.matmul(x, x.T) / (x.shape[1] - 1)
        jax.debug.callback(
            lambda c: captured.__setitem__("cov", np.asarray(c)), cov)
        return orig(field, nmodes, return_filter)

    pl.pca_filter = spy
    try:
        for dt in ("float64",):
            cfg = pl.PipelineConfig(dtype=dt, draw_dtype="float32",
                                    threefry_noise=True)
            fn = pl.make_pipeline(grid, cosmology, cfg)
            out = fn(jax.random.PRNGKey(1000))
            np.asarray(out["pk_cleaned"])  # force
    finally:
        pl.pca_filter = orig

    cov = captured["cov"]
    w = np.linalg.eigvalsh(cov)[::-1]
    print("top-8 eigvals:", w[:8])
    print("lambda4/lambda5 gap ratio:", w[3] / w[4],
          " lambda1/lambda4:", w[0] / w[3])
    np.savez(f"cov_{nsamp}.npz", cov=cov, eigvals=w)
    print(f"wrote cov_{nsamp}.npz")


if __name__ == "__main__":
    main()
