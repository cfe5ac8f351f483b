#!/usr/bin/env python
"""Reproduce the truth-gate TPU numbers key-by-key (round-4 accuracy hunt).

A fresh TPU stage capture (key 1000, shipping config) measured cleaned-P(k)
errors ~1.4e-4 vs the same committed truth the gate reports 1.28e-2
against.  The two candidate explanations: (a) keys 1001-1003 dominate the
gate's max, (b) the gate's fft_safe.PREFER_MM=True forcing selects a less
accurate transform path than the production probe-and-reroute default.
This probe runs the shipping gate config over all truth keys with
PREFER_MM off and on and prints per-key/per-bin errors.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_fastbox"))

    import fastbox_tpu.pipeline as pl
    from fastbox_tpu.cosmology import build_cosmology
    from fastbox_tpu.grid import GridSpec
    from fastbox_tpu.ops import fft_safe

    d = np.load("truth_gate_256.npz")
    nsamp, box, redshift = d["meta"]
    keys = [int(s) for s in d["keys"]]
    t_c = d["pk_cleaned"]

    grid = GridSpec.create(box_scale=(float(box),) * 3, nsamp=int(nsamp),
                           redshift=float(redshift))
    cosmology = build_cosmology(
        dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8),
        redshift=float(redshift))
    cfg = pl.PipelineConfig(dtype="float32", draw_dtype="float32",
                            threefry_noise=True, mm3d_precision="HIGH",
                            vel_precision="DEFAULT")

    for prefer_mm in (False, True):
        fft_safe.PREFER_MM = prefer_mm
        jax.clear_caches()
        fn = pl.make_pipeline(grid, cosmology, cfg)
        print(f"PREFER_MM={prefer_mm}")
        for i, seed in enumerate(keys):
            c = np.asarray(fn(jax.random.PRNGKey(seed))["pk_cleaned"],
                           np.float64)
            good = np.isfinite(t_c[i]) & (np.abs(t_c[i]) > 0)
            r = np.where(good, (c - t_c[i]) / np.where(good, t_c[i], 1.0), 0.0)
            print(f"  key {seed}: max|rel|={np.abs(r).max():.3e}  low5:",
                  np.array2string(r[:5],
                                  formatter={'float_kind':
                                             lambda x: f'{x:+.2e}'}),
                  flush=True)
    fft_safe.PREFER_MM = False


if __name__ == "__main__":
    main()
