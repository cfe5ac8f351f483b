#!/usr/bin/env python
"""Decompose the TPU delta_s / cleaned divergence (round-4 accuracy hunt).

Given the stage captures from scripts/probe_stage_diff.py (f64 truth +
TPU f32 on the same threefry realisation), re-run the f64 ORACLE
transforms on the TPU's own intermediate inputs to split each stage's
error into "inherited from inputs" vs "introduced by the TPU kernel":

  delta_s:  oracle_rsd(delta_x_tpu, vel_z_tpu)   [input error only]
            vs delta_s_tpu                        [kernel error]
            + the two mixed runs to attribute delta_x vs vel_z.
  cleaned:  oracle_pca(data_tpu) vs cleaned_tpu / cleaned_truth.

Run on CPU (forces jax_platforms=cpu): uses ~6 GiB and a few minutes of
the single core.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rel(a, b, scale):
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    return (f"max={np.abs(d).max()/scale:.3e} "
            f"rms={np.sqrt(np.mean(d*d))/scale:.3e}")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_fastbox"))
    import jax.numpy as jnp

    from fastbox_tpu.cosmology import build_cosmology
    from fastbox_tpu.fields import transforms
    from fastbox_tpu.filters import pca_filter
    from fastbox_tpu.grid import GridSpec
    from fastbox_tpu.ops import rsd as rsd_ops
    from fastbox_tpu.pipeline import _hi_bias

    tpu = np.load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/stages_tpu.npz")
    tru = np.load(sys.argv[2] if len(sys.argv) > 2 else "/tmp/stages_f64.npz")

    N = tpu["delta_x"].shape[0]
    grid = GridSpec.create(box_scale=(4e3,) * 3, nsamp=N, redshift=0.8)
    cosmology = build_cosmology(
        dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8),
        redshift=0.8)
    bias = float(_hi_bias(grid.redshift))
    Hz = 100.0 * cosmology.h * cosmology.Ea

    def oracle_rsd(delta_x, vel_z):
        dl = transforms.lognormal(jnp.asarray(delta_x, jnp.float64) * bias)
        # captured vel_z already includes the sigma_nl threefry draw
        return np.asarray(rsd_ops.redshift_space_density(
            dl, jnp.asarray(vel_z, jnp.float64), grid, Hz, sigma_nl=0.0,
            method="linear"))

    ds_scale = float(np.sqrt(np.mean(tru["delta_s"].astype(np.float64)**2)))
    print(f"delta_s scale={ds_scale:.4e}")
    o_tt = oracle_rsd(tpu["delta_x"], tpu["vel_z"])
    print("  oracle(dx_tpu, vz_tpu) vs truth   [input err] :",
          rel(o_tt, tru["delta_s"], ds_scale))
    print("  tpu delta_s vs oracle(tpu inputs) [kernel err]:",
          rel(tpu["delta_s"], o_tt, ds_scale))
    o_mt = oracle_rsd(tru["delta_x"], tpu["vel_z"])
    print("  oracle(dx_truth, vz_tpu) vs truth [vel err]   :",
          rel(o_mt, tru["delta_s"], ds_scale))
    o_tm = oracle_rsd(tpu["delta_x"], tru["vel_z"])
    print("  oracle(dx_tpu, vz_truth) vs truth [dx err]    :",
          rel(o_tm, tru["delta_s"], ds_scale))
    del o_tt, o_mt, o_tm

    cl_scale = float(np.sqrt(np.mean(tru["cleaned"].astype(np.float64)**2)))
    print(f"cleaned scale={cl_scale:.4e}")
    oc = np.asarray(pca_filter(jnp.asarray(tpu["data"], jnp.float64), 4))
    print("  oracle_pca(data_tpu) vs truth     [input err] :",
          rel(oc, tru["cleaned"], cl_scale))
    print("  tpu cleaned vs oracle_pca(data_tpu) [kern err]:",
          rel(tpu["cleaned"], oc, cl_scale))


if __name__ == "__main__":
    main()
