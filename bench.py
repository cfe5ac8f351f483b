#!/usr/bin/env python
"""Benchmark: full 256^3 realize -> RSD -> filter -> P(k) pipelines/sec/chip.

This is the headline metric from BASELINE.json.  The reference FastBox runs
the equivalent 128^3 pipeline in ~35 s on one CPU process (~0.0286
pipelines/sec; BASELINE.md) — dominated by its per-LOS Python RSD loop and
per-bin digitize loop.  Here the whole pipeline is one jitted XLA program.

``vs_baseline`` is measured-rate / 0.0286 — conservative, since the
reference number is for boxes with 8x fewer voxels.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "pipelines/s", "vs_baseline": N}
"""
import argparse
import dataclasses
import json
import os
import sys
import time

# MODULE-default matmul-DFT einsum precision for the benchmark process
# (the small 2D foreground transforms).  This stays HIGHEST: the FG cube
# is 100-1000x brighter than the signal, so a HIGH-tier FG transform
# error is signal-scale after the PCA subtraction — the all-HIGH mode
# measured 2.1e-2 vs the f64 truth oracle where the shipping path sits
# at 6.4e-3 (TRUTH_GATE.json, scripts/truth_gate.py).  The three BIG 3D
# transforms run at HIGH by default instead (PipelineConfig
# .mm3d_precision): truth-gated admissible at 6.9e-3, same class as
# HIGHEST, against an f32 conditioning floor of 2.9e-3.  --mm-precision
# overrides the module default; the env var must be set before
# fastbox_tpu imports.
_early = argparse.ArgumentParser(add_help=False)
_early.add_argument("--mm-precision", default=None)
_mmp = _early.parse_known_args(sys.argv[1:])[0].mm_precision
if _mmp is not None:
    os.environ["FASTBOX_MM_PRECISION"] = _mmp
else:
    os.environ.setdefault("FASTBOX_MM_PRECISION", "HIGHEST")

import jax

# Persistent compilation cache: the driver re-runs this script each round.
os.makedirs(os.path.expanduser("~/.cache/jax_fastbox"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

import fastbox_tpu

fastbox_tpu.ensure_platform()  # honor JAX_PLATFORMS despite the axon plugin

from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.pipeline import PipelineConfig, make_pipeline

REFERENCE_RATE = 1.0 / 35.0  # 128^3 pipelines/sec, single CPU (BASELINE.md)


def _backend_watchdog(seconds: float):
    """Emit a parseable JSON error and exit if backend init hangs.

    The axon tunnel, when down, makes the first jax operation block
    indefinitely (observed 2026-08-18: >10 h outage).  A daemon timer
    turns that into one JSON line so the driver records *something*.
    Returns a cancel() callable.
    """
    import threading

    def fire():
        print(json.dumps({
            "metric": "backend init",
            "value": 0.0,
            "unit": "pipelines/s",
            "vs_baseline": 0.0,
            "error": f"TPU backend init exceeded {seconds:.0f}s "
                     "(tunnel down?)",
        }), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t.cancel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsamp", type=int, default=256)
    ap.add_argument("--box", type=float, default=4e3)
    ap.add_argument("--redshift", type=float, default=0.8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=3,
                    help="repeat the timed window this many times and "
                         "report the best (the axon tunnel adds ~0.7%% "
                         "run-to-run jitter; min-over-windows is the "
                         "standard way to measure device throughput "
                         "under host-side noise)")
    ap.add_argument("--batch", type=int, default=1,
                    help="vmap this many pipelines per step (ensemble mode)")
    ap.add_argument("--mm-precision", default=None,
                    help="MODULE-default matmul-DFT einsum precision "
                         "(DEFAULT/HIGH/HIGHEST); default HIGHEST — "
                         "all-HIGH fails the truth gate at 2.1e-2 "
                         "(TRUTH_GATE.json) — parsed before jax "
                         "import, listed here for --help")
    ap.add_argument("--mm3d-precision", default=None,
                    help="einsum precision for the three BIG 3D matmul "
                         "DFTs only (the tiny 2D FG transforms keep "
                         "--mm-precision); default HIGH, truth-gated "
                         "admissible (scripts/truth_gate.py)")
    ap.add_argument("--fft-pair", action="store_true",
                    help="fuse the (delta_x, vel_z) inverse pair into one "
                         "complex MXU inverse; REJECTED by the 256^3 truth "
                         "gate (6.4e-2 with a systematic +2%% low-bin bias, "
                         "TRUTH_GATE_256.json) and slower on TPU anyway — "
                         "kept for off-TPU backends")
    ap.add_argument("--pallas-draw", default=None,
                    choices=["auto", "on", "off", "vz"],
                    help="density-draw backend (PipelineConfig.pallas_draw); "
                         "default off (composition loser: 90.6 vs 93.3 "
                         "pipelines/s at 256^3); on/auto = fused on-core "
                         "PRNG draw on TPU (different stream than threefry; "
                         "statistics validated by "
                         "scripts/check_pallas_draw_stats.py); vz "
                         "additionally fuses the velocity k-weighting "
                         "into the draw kernel (round-4 experiment)")
    ap.add_argument("--vel-precision", default=None,
                    choices=["DEFAULT", "HIGH", "HIGHEST", "SPLIT"],
                    help="einsum precision for the velocity inverse "
                         "transform only; default "
                         "inherits --mm3d-precision; see truth-gate "
                         "variant 'vel_default'")
    ap.add_argument("--dx-precision", default=None,
                    choices=["DEFAULT", "HIGH", "HIGHEST", "SPLIT"],
                    help="einsum precision for the delta_x inverse "
                         "transform only (default inherits "
                         "--mm3d-precision; truth-gate variant "
                         "'dx_default')")
    ap.add_argument("--fwd-precision", default=None,
                    choices=["DEFAULT", "HIGH", "HIGHEST", "SPLIT"],
                    help="einsum precision for the cleaned-cube forward "
                         "transform only (default inherits "
                         "--mm3d-precision; truth-gate variant "
                         "'fwd_default')")
    ap.add_argument("--pca-precision", default=None,
                    choices=["DEFAULT", "HIGH", "HIGHEST"],
                    help="einsum precision for the PCA covariance/"
                         "projection GEMMs (default HIGHEST; HIGH is "
                         "the round-4 gate candidate, variant "
                         "'pca_high')")
    ap.add_argument("--pallas-pk", default=None,
                    choices=["auto", "on", "off", "v2", "v2t"],
                    help="binned-P(k) reduction backend "
                         "(PipelineConfig.pallas_pk): v2 = hoisted-"
                         "counts kernel (bit-identical sums), v2t = "
                         "telescoped digitize (gate first)")
    ap.add_argument("--eigh-hoist", default=None,
                    choices=["auto", "on", "off"],
                    help="chained-pipeline batched-eigh hoist "
                         "(PipelineConfig.eigh_hoist; default off — "
                         "'auto' also resolves to off everywhere after "
                         "the measured round-4 composition loss; 'on' "
                         "forces the hoist)")
    ap.add_argument("--draw-method", default=None,
                    choices=["erfinv", "box_muller"],
                    help="bits->normal transform for the density draw "
                         "(PipelineConfig.draw_method; box_muller is the "
                         "lighter lowering but a different stream)")
    ap.add_argument("--pca", default=None, choices=["exact", "subspace"],
                    help="PCA clean backend: exact eigh (default) or the "
                         "oversampled subspace + Rayleigh-Ritz iteration "
                         "(PipelineConfig.pca_exact=False)")
    ap.add_argument("--chain", type=int, default=None,
                    help="scan this many pipelines per dispatch (amortises "
                         "the ~5 ms tunnel launch overhead; 1 = one "
                         "program per realisation). Default is "
                         "size-dependent: 16 up to 256^3 (measured "
                         "96.3 -> 100.3 pipelines/s over chain=8), 4 from "
                         "512^3 up (chain=8 regresses 9.60 -> 9.43 and "
                         "large chains compile for many minutes)")
    ap.add_argument("--out-json", default=None,
                    help="also write the final JSON line to this file "
                         "(driver-style artifacts, e.g. BENCH_512_r05.json)")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--init-timeout", type=float, default=900.0,
                    help="seconds before a hung backend init is reported "
                         "as a JSON error (0 disables)")
    args = ap.parse_args()

    if args.init_timeout > 0:
        cancel = _backend_watchdog(args.init_timeout)
        jax.devices()  # force backend init under the watchdog
        cancel()

    grid = GridSpec.create(box_scale=(args.box,) * 3, nsamp=args.nsamp,
                           redshift=args.redshift)
    cosmology = build_cosmology(
        dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8),
        redshift=args.redshift,
    )
    config = PipelineConfig(dtype="float32")
    if args.mm3d_precision is not None:  # None keeps the config default
        config = dataclasses.replace(config,
                                     mm3d_precision=args.mm3d_precision)
    if args.fft_pair:
        config = dataclasses.replace(config, fft_pair=True)
    if args.pallas_draw is not None:
        config = dataclasses.replace(config, pallas_draw=args.pallas_draw)
    if args.pca is not None:
        config = dataclasses.replace(config,
                                     pca_exact=args.pca == "exact")
    if args.vel_precision is not None:
        config = dataclasses.replace(config,
                                     vel_precision=args.vel_precision)
    if args.draw_method is not None:
        config = dataclasses.replace(config, draw_method=args.draw_method)
    if args.dx_precision is not None:
        config = dataclasses.replace(config, dx_precision=args.dx_precision)
    if args.fwd_precision is not None:
        config = dataclasses.replace(config, fwd_precision=args.fwd_precision)
    if args.eigh_hoist is not None:
        config = dataclasses.replace(config, eigh_hoist=args.eigh_hoist)
    if args.pca_precision is not None:
        config = dataclasses.replace(config,
                                     pca_precision=args.pca_precision)
    if args.pallas_pk is not None:
        config = dataclasses.replace(config, pallas_pk=args.pallas_pk)
    if args.chain is None:
        # 512^3: chain=7 is the measured optimum with the round-4 body
        # (10.03 vs 9.98 at chain=6, pca HIGH + binned-pk v2); the scan
        # live set shrank enough to move the knee up from 6.
        args.chain = 16 if args.nsamp <= 256 else 7
    if args.batch > 1:
        from fastbox_tpu.pipeline import make_ensemble_pipeline

        args.chain = 1  # ensemble mode: the chain branch never runs
        fn_b = make_ensemble_pipeline(grid, cosmology, config)
        fn = lambda key: fn_b(jax.random.split(key, args.batch))
    elif args.chain > 1:
        from fastbox_tpu.pipeline import make_chained_pipeline

        fn_c = make_chained_pipeline(grid, cosmology, config)
        fn = lambda key: fn_c(jax.random.split(key, args.chain))
    else:
        fn = make_pipeline(grid, cosmology, config)
    per_iter = args.batch * args.chain  # realisations per timed iteration

    keys = jax.random.split(jax.random.PRNGKey(0), args.warmup + args.iters)

    # Warmup / compile
    t0 = time.perf_counter()
    for i in range(args.warmup):
        out = fn(keys[i])
    jax.block_until_ready(out)
    if args.verbose:
        print(f"# compile+warmup: {time.perf_counter() - t0:.1f}s")

    dt = None
    for rep in range(max(1, args.repeats)):
        t0 = time.perf_counter()
        outs = [fn(keys[args.warmup + i]) for i in range(args.iters)]
        jax.block_until_ready(outs)
        # Hard sync: materialise the last result on the host.  Execution
        # is a FIFO stream, so this guarantees every queued program
        # finished even if block_until_ready returns early through the
        # remote-execution tunnel.
        np.asarray(outs[-1]["pk_cleaned"])
        dt_rep = time.perf_counter() - t0
        dt = dt_rep if dt is None else min(dt, dt_rep)
        if args.verbose:
            print(f"# window {rep}: {dt_rep:.3f}s")

    rate = args.iters * per_iter / dt
    if args.verbose:
        pk = np.asarray(outs[-1]["pk_cleaned"]).reshape(-1)
        print(f"# {dt:.3f}s for {args.iters * per_iter} pipelines at "
              f"{args.nsamp}^3 on {jax.devices()[0].platform}; "
              f"pk head: {pk[:3]}")

    doc = {
        "metric": f"{args.nsamp}^3 realize->RSD->filter->P(k) pipelines/sec/chip",
        "value": round(rate, 4),
        "unit": "pipelines/s",
        "vs_baseline": round(rate / REFERENCE_RATE, 2),
        "platform": jax.devices()[0].platform,
        "chain": args.chain,
        "batch": args.batch,
        "mm_precision": os.environ.get("FASTBOX_MM_PRECISION", "HIGHEST"),
        "mm3d_precision": config.mm3d_precision,
        "pallas_draw": config.pallas_draw,
        "pca": "exact" if config.pca_exact else "subspace",
        "vel_precision": config.vel_precision,
        "dx_precision": config.dx_precision,
        "fwd_precision": config.fwd_precision,
        "eigh_hoist": config.eigh_hoist,
        "pca_precision": config.pca_precision,
        "pallas_pk": config.pallas_pk,
        "draw_method": config.draw_method,
    }
    print(json.dumps(doc))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
