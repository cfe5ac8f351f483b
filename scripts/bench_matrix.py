#!/usr/bin/env python
"""One-process sweep of the pipeline perf knobs on the live backend.

Runs the 256^3 (and optionally 512^3) flagship pipeline across the knob
matrix {chain} x {fft_pair} x {PREFER_MM} sequentially in one process, so
the ~minutes of tunnel/compile overhead is paid once.  Prints one JSON
line per configuration plus a final best-of summary.

Usage (real TPU, from the repo root):
    python scripts/bench_matrix.py --nsamp 256 --iters 8
    python scripts/bench_matrix.py --nsamp 512 --iters 3 --chains 1,2
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))

import numpy as np

from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.ops import fft_safe
from fastbox_tpu.pipeline import (PipelineConfig, make_chained_pipeline,
                                  make_pipeline)


def time_config(grid, cosmology, chain, fft_pair, prefer_mm, iters, warmup):
    fft_safe.PREFER_MM = prefer_mm
    config = PipelineConfig(dtype="float32", fft_pair=fft_pair)
    if chain > 1:
        fn_c = make_chained_pipeline(grid, cosmology, config)
        fn = lambda key: fn_c(jax.random.split(key, chain))
    else:
        fn = make_pipeline(grid, cosmology, config)
    keys = jax.random.split(jax.random.PRNGKey(0), warmup + iters)
    out = None
    for i in range(warmup):
        out = fn(keys[i])
    if out is not None:
        np.asarray(out["pk_cleaned"])
    t0 = time.perf_counter()
    outs = [fn(keys[warmup + i]) for i in range(iters)]
    jax.block_until_ready(outs)
    np.asarray(outs[-1]["pk_cleaned"])  # hard sync (tunnel-safe)
    dt = time.perf_counter() - t0
    pk = np.asarray(outs[-1]["pk_cleaned"]).reshape(-1)
    return iters * chain / dt, pk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsamp", type=int, default=256)
    ap.add_argument("--box", type=float, default=4e3)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--chains", type=str, default="1,4,8")
    ap.add_argument("--mm-precision", type=str, default="HIGHEST",
                    choices=("DEFAULT", "HIGH", "HIGHEST"),
                    help="einsum precision for the matmul-DFT path "
                         "(affects prefer_mm/fft_pair configs only)")
    args = ap.parse_args()

    from fastbox_tpu.ops import mmfft
    mmfft.set_precision(args.mm_precision)

    grid = GridSpec.create(box_scale=(args.box,) * 3, nsamp=args.nsamp,
                           redshift=0.8)
    cosmology = build_cosmology(
        dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8),
        redshift=0.8)

    results = []
    ref_pk = {}  # per-chain baseline (each chain value splits keys its own way)
    for chain in [int(c) for c in args.chains.split(",")]:
        for fft_pair in (False, True):
            for prefer_mm in (False, True):
                tag = dict(chain=chain, fft_pair=fft_pair,
                           prefer_mm=prefer_mm,
                           mm_precision=args.mm_precision)
                try:
                    rate, pk = time_config(grid, cosmology, chain, fft_pair,
                                           prefer_mm, args.iters, args.warmup)
                except Exception as exc:  # noqa: BLE001 - sweep must go on
                    print(json.dumps({**tag, "error": str(exc)[:200]}))
                    continue
                # accuracy guard: same-seed pk vs this chain's BASELINE
                # config (both knobs off) — anchor only on that config so
                # a failed baseline never silently re-anchors to a knob run
                if not fft_pair and not prefer_mm:
                    ref_pk[chain] = pk
                base = ref_pk.get(chain)
                dev = (float(np.nanmax(np.abs(pk / base - 1.0)))
                       if base is not None else None)
                results.append((rate, tag))
                print(json.dumps({**tag, "rate": round(rate, 2),
                                  "pk_maxdev_vs_base":
                                      None if dev is None else round(dev, 6)}),
                      flush=True)
    if results:
        best = max(results)
        print(json.dumps({"best_rate": round(best[0], 2), **best[1]}))


if __name__ == "__main__":
    main()
