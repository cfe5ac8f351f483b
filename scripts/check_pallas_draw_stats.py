#!/usr/bin/env python
"""Statistical gate for the Pallas density-draw (PipelineConfig.pallas_draw).

The on-core PRNG draw (ops/pallas/half_draw.py) produces a DIFFERENT
stream than threefry, so the per-bin truth gate (scripts/truth_gate.py)
cannot compare it — same-key realisations are different realisations.
The admissibility criterion for a stream change is therefore
STATISTICAL: over an ensemble of keys, every pipeline statistic must be
distributionally indistinguishable between the two draws.

This runs K realisations at --nsamp^3 with pallas_draw off and on (one
TPU process, two chained programs) and applies two-sample z-tests per
P(k) bin (density and cleaned) plus sigma_data.  Pass = all |z| < the
--zmax bound (default 5; with ~20 bins x 3 statistics, a 5-sigma
per-bin bound has negligible false-alarm rate while catching any real
variance/bias error of a few percent at K=32).

Run from the repo root (no PYTHONPATH):
    python scripts/check_pallas_draw_stats.py --nsamp 128 --keys 32
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs(os.path.expanduser("~/.cache/jax_fastbox"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

import fastbox_tpu

fastbox_tpu.ensure_platform()

from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.pipeline import PipelineConfig, make_chained_pipeline


def run(grid, cosmology, config, keys):
    fn = make_chained_pipeline(grid, cosmology, config)
    out = fn(keys)
    return {k: np.asarray(v, np.float64) for k, v in out.items()}


def ztest(a, b, axis=0):
    """Two-sample z statistic per bin (unequal variance).

    Empty P(k) bins are NaN in every sample (the estimator's convention);
    they carry no information and are masked to z=0.
    """
    K = a.shape[axis]
    se = np.sqrt(a.var(axis=axis, ddof=1) / K + b.var(axis=axis, ddof=1) / K)
    se = np.where(se > 0, se, np.inf)
    z = (a.mean(axis=axis) - b.mean(axis=axis)) / se
    return np.where(np.isfinite(z), z, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsamp", type=int, default=128)
    ap.add_argument("--box", type=float, default=2e3)
    ap.add_argument("--keys", type=int, default=32)
    ap.add_argument("--zmax", type=float, default=5.0)
    ap.add_argument("--out", default="PALLAS_DRAW_GATE.json")
    args = ap.parse_args()

    grid = GridSpec.create(box_scale=(args.box,) * 3, nsamp=args.nsamp,
                           redshift=0.8)
    cosmology = build_cosmology(
        dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8),
        redshift=0.8)
    keys = jax.random.split(jax.random.PRNGKey(2026), args.keys)

    base = PipelineConfig(dtype="float32")
    off = run(grid, cosmology,
              dataclasses.replace(base, pallas_draw="off"), keys)
    on = run(grid, cosmology,
             dataclasses.replace(base, pallas_draw="on"), keys)

    stats = {}
    worst = 0.0
    for name in ("pk_density", "pk_cleaned", "sigma_data"):
        a, b = on[name], off[name]
        if a.ndim == 1:
            a, b = a[:, None], b[:, None]
        z = ztest(a, b)
        ma, mb = a.mean(0), b.mean(0)
        good = np.isfinite(ma) & np.isfinite(mb) & (mb != 0)
        ratio_dev = np.where(good, ma / np.where(good, mb, 1.0) - 1.0, 0.0)
        stats[name] = {
            "max_abs_z": float(np.max(np.abs(z))),
            "mean_ratio_dev": float(np.max(np.abs(ratio_dev))),
        }
        worst = max(worst, stats[name]["max_abs_z"])
        print(f"[draw-gate] {name:12s} max|z|={stats[name]['max_abs_z']:.2f} "
              f"mean-ratio-dev={stats[name]['mean_ratio_dev']:.3e}",
              flush=True)

    verdict = "PASS" if worst < args.zmax else "FAIL"
    summary = {"nsamp": args.nsamp, "keys": args.keys, "zmax": args.zmax,
               "worst_abs_z": worst, "verdict": verdict, "stats": stats,
               "platform": jax.devices()[0].platform}
    print(json.dumps(summary))
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[draw-gate] {verdict}; wrote {args.out}", flush=True)
    sys.exit(0 if verdict == "PASS" else 1)


if __name__ == "__main__":
    main()
