#!/usr/bin/env python
"""AOT-compile the sharded ensemble step at >=1024^3 and record the
memory budget — the BASELINE ">=1024^3, sharded over ICI" artifact.

Real multi-chip hardware is not reachable from this environment, so the
program is lowered and compiled on the 8-virtual-device CPU mesh
(mesh {'ens':1,'space':8} — the decomposition a v5e-8 would use for one
big box).  Compilation performs full SPMD partitioning and buffer
assignment: the per-device buffer sizes it reports are the sizes the
TPU program would bind (logical bytes are backend-independent), giving
a concrete per-chip HBM budget for the 1024^3 configuration.

    python scripts/compile_1024.py --nsamp 1024 --out SCALING_1024.json

Writes one JSON with {nsamp, mesh, compile_seconds, per_device_bytes:
{arguments, outputs, temps, generated_code, total}, fits_v5e_16gib}.
"""
import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.parallel.sharded import make_sharded_ensemble_step
from fastbox_tpu.pipeline import PipelineConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsamp", type=int, default=1024)
    ap.add_argument("--space", type=int, default=8)
    ap.add_argument("--ens", type=int, default=1)
    ap.add_argument("--batch", type=int, default=None,
                    help="total realisations per step (default = ens)")
    ap.add_argument("--out", default="SCALING_1024.json")
    args = ap.parse_args()

    ndev = args.space * args.ens
    devs = np.array(jax.devices()[:ndev]).reshape(args.ens, args.space)
    mesh = Mesh(devs, ("ens", "space"))
    grid = GridSpec.create(box_scale=(2e4,) * 3, nsamp=args.nsamp,
                           redshift=0.8)
    cosmology = build_cosmology(
        dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8),
        redshift=0.8)
    config = PipelineConfig(dtype="float32")
    fn = make_sharded_ensemble_step(mesh, grid, cosmology, config)

    B = args.batch if args.batch is not None else args.ens
    keys = jax.device_put(
        jax.random.split(jax.random.PRNGKey(0), B),
        NamedSharding(mesh, P("ens")))

    print(f"[compile] lowering {args.nsamp}^3 over mesh "
          f"{{'ens': {args.ens}, 'space': {args.space}}} ...", flush=True)
    t0 = time.perf_counter()
    lowered = fn.lower(keys)
    t_lower = time.perf_counter() - t0
    print(f"[compile] lowered in {t_lower:.1f}s; compiling ...", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"[compile] compiled in {t_compile:.1f}s", flush=True)

    ma = compiled.memory_analysis()
    per_dev = {
        "arguments": int(getattr(ma, "argument_size_in_bytes", 0)),
        "outputs": int(getattr(ma, "output_size_in_bytes", 0)),
        "temps": int(getattr(ma, "temp_size_in_bytes", 0)),
        "generated_code": int(getattr(ma, "generated_code_size_in_bytes", 0)),
        "aliases": int(getattr(ma, "alias_size_in_bytes", 0)),
    }
    total = (per_dev["arguments"] + per_dev["outputs"] + per_dev["temps"]
             + per_dev["generated_code"] - per_dev["aliases"])
    per_dev["total"] = total
    gib = total / 2**30
    summary = {
        "nsamp": args.nsamp,
        "mesh": {"ens": args.ens, "space": args.space},
        "batch": B,
        "lower_seconds": round(t_lower, 1),
        "compile_seconds": round(t_compile, 1),
        "per_device_bytes": per_dev,
        "per_device_gib": round(gib, 3),
        "fits_v5e_16gib": bool(gib < 16.0),
        "backend": "cpu-8dev (SPMD partitioning identical to TPU; "
                   "byte sizes are logical, backend-independent)",
    }
    print(json.dumps(summary))
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[compile] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
