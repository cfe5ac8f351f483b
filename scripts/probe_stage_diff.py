#!/usr/bin/env python
"""Stage-by-stage cross-platform divergence probe for the end-to-end
pipeline (round 4 accuracy hunt).

Background: every 256^3 truth-gate variant shows the same ~+4e-3 low-bin
systematic on cleaned P(k), invariant to the DFT weight precision
(HIGH/HIGHEST/SPLIT — TRUTH_GATE_256_SPLIT.json), while pk_density sits
at 1.6e-5 and the real-covariance eigh probe exonerates the TPU f32 eigh
(sin(theta)=1.3e-5, scripts/probe_eigh_subspace.py --real).  So the
divergence enters between the density cube and the cleaned spectrum.
This probe captures every intermediate cube on the SAME threefry
realisation (PipelineConfig(draw_dtype='float32', threefry_noise=True))
on TPU, CPU-f32, and CPU-f64, then reports per-stage errors vs the f64
truth — the stage where TPU >> CPU-f32 is the culprit.

Usage:
  python scripts/probe_stage_diff.py capture --platform tpu --dtype float32 --out /tmp/stages_tpu.npz
  python scripts/probe_stage_diff.py capture --platform cpu --dtype float32 --out /tmp/stages_cpu32.npz
  python scripts/probe_stage_diff.py capture --platform cpu --dtype float64 --out /tmp/stages_f64.npz
  python scripts/probe_stage_diff.py compare /tmp/stages_f64.npz /tmp/stages_cpu32.npz /tmp/stages_tpu.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STAGES = ["delta_x", "vel_z", "delta_s", "fg_map", "alpha_map", "fg_cube",
          "data", "cleaned", "ck_power", "pk_cleaned", "pk_density"]


def capture(args):
    import jax

    if args.platform == "cpu":
        # NB: the JAX_PLATFORMS env var alone is NOT honoured once the
        # axon PJRT plugin is installed (measured 2026-08-20); only the
        # config.update call forces CPU.
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_fastbox"))

    import fastbox_tpu.pipeline as pl
    from fastbox_tpu.cosmology import build_cosmology
    from fastbox_tpu.grid import GridSpec

    grid = GridSpec.create(box_scale=(4e3,) * 3, nsamp=args.nsamp,
                           redshift=0.8)
    cosmology = build_cosmology(
        dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8),
        redshift=0.8)
    cfg = pl.PipelineConfig(dtype=args.dtype, draw_dtype="float32",
                            threefry_noise=True, debug_stages=True,
                            mm3d_precision=args.mm3d_precision,
                            vel_precision=args.vel_precision)
    fn = pl.make_pipeline(grid, cosmology, cfg)
    out = fn(jax.random.PRNGKey(args.key))
    save = {k: np.asarray(v) for k, v in out.items() if k in STAGES}
    np.savez(args.out, **save)
    print(f"wrote {args.out}: "
          + ", ".join(f"{k}{v.shape}" for k, v in save.items()))


def _rel(a, b, scale):
    """max/rms of (a-b) relative to a robust scale of the truth field."""
    d = a.astype(np.float64) - b.astype(np.float64)
    return (np.abs(d).max() / scale,
            np.sqrt(np.mean(d * d)) / scale)


def compare(paths):
    truth = np.load(paths[0])
    others = [(os.path.basename(p), np.load(p)) for p in paths[1:]]
    print(f"{'stage':<12}{'scale':>12}", end="")
    for name, _ in others:
        print(f"{name + ' max':>24}{'rms':>12}", end="")
    print()
    for st in STAGES:
        if st not in truth:
            continue
        t = truth[st].astype(np.float64)
        scale = float(np.sqrt(np.mean(t * t))) or 1.0
        print(f"{st:<12}{scale:>12.4e}", end="")
        for _, d in others:
            if st not in d:
                print(f"{'---':>24}{'---':>12}", end="")
                continue
            mx, rms = _rel(t, d[st], scale)
            print(f"{mx:>24.3e}{rms:>12.3e}", end="")
        print()


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    cap = sub.add_parser("capture")
    cap.add_argument("--platform", choices=["tpu", "cpu"], required=True)
    cap.add_argument("--dtype", choices=["float32", "float64"],
                     default="float32")
    cap.add_argument("--nsamp", type=int, default=256)
    cap.add_argument("--key", type=int, default=1000)
    cap.add_argument("--mm3d-precision", default="HIGH")
    cap.add_argument("--vel-precision", default="DEFAULT")
    cap.add_argument("--out", required=True)
    cmp_ = sub.add_parser("compare")
    cmp_.add_argument("paths", nargs="+",
                      help="truth.npz then one or more candidate.npz")
    args = ap.parse_args()
    if args.cmd == "capture":
        capture(args)
    else:
        compare(args.paths)


if __name__ == "__main__":
    main()
