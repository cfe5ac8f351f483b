#!/usr/bin/env python
"""AOT-compile the 1024^3 sharded step for a REAL v5e-8 TPU topology.

The axon terminal exposes a chipless TpuAotCompiler, and
jax.experimental.topologies can build abstract device meshes for
topologies we do not physically have — combining the two gives the true
XLA:TPU buffer assignment (per-chip HBM budget) for the BASELINE
">=1024^3 sharded over ICI" configuration, something the CPU-mesh
compile cannot provide (its memory analysis aggregates all host-backed
devices and its buffer assignment is not the TPU one).

    python scripts/compile_1024_tpu.py --nsamp 1024 --out SCALING_1024_TPU.json

Falls back through several topology-name spellings; reports the first
that the PJRT plugin accepts.
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

import jax.numpy as jnp
import numpy as np

import fastbox_tpu

fastbox_tpu.ensure_platform()

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.parallel.sharded import make_sharded_ensemble_step
from fastbox_tpu.pipeline import PipelineConfig


def get_topology(names):
    from jax.experimental import topologies

    errs = {}
    for name in names:
        try:
            topo = topologies.get_topology_desc(topology_name=name)
            return name, topo, errs
        except Exception as e:  # try the next spelling
            errs[name] = f"{type(e).__name__}: {e}"[:200]
    return None, None, errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsamp", type=int, default=1024)
    ap.add_argument("--space", type=int, default=8)
    ap.add_argument("--ens", type=int, default=1)
    ap.add_argument("--out", default="SCALING_1024_TPU.json")
    args = ap.parse_args()

    names = ["v5e:2x4", "v5e:4x2", "v5litepod-8", "tpu_v5e:2x4",
             "v5e:1x8", "v5e:8"]
    name, topo, errs = get_topology(names)
    if topo is None:
        print(json.dumps({"error": "no topology accepted", "tried": errs}))
        sys.exit(1)
    print(f"[aot] topology '{name}': {len(topo.devices)} devices", flush=True)

    ndev = args.space * args.ens
    devs = np.array(topo.devices[:ndev]).reshape(args.ens, args.space)
    mesh = Mesh(devs, ("ens", "space"))
    grid = GridSpec.create(box_scale=(2e4,) * 3, nsamp=args.nsamp,
                           redshift=0.8)
    cosmology = build_cosmology(
        dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8),
        redshift=0.8)
    fn = make_sharded_ensemble_step(mesh, grid, cosmology,
                                    PipelineConfig(dtype="float32"))

    B = args.ens
    # Typed PRNG-key ShapeDtypeStructs fail to lower against abstract
    # topology devices (key_data.ndim check) — lower on raw uint32 key
    # data and wrap inside the program instead.
    raw_sds = jax.ShapeDtypeStruct(
        (B, 2), jnp.uint32, sharding=NamedSharding(mesh, P("ens", None)))

    def entry(raw):
        return fn(jax.vmap(jax.random.wrap_key_data)(raw))

    t0 = time.perf_counter()
    lowered = jax.jit(entry).lower(raw_sds)
    t_lower = time.perf_counter() - t0
    print(f"[aot] lowered in {t_lower:.1f}s; compiling for {name} ...",
          flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"[aot] compiled in {t_compile:.1f}s", flush=True)

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
        "topology": name,
        "mesh": {"ens": args.ens, "space": args.space},
        "lower_seconds": round(t_lower, 1),
        "compile_seconds": round(t_compile, 1),
        "per_device_bytes": per_dev,
        "per_device_gib": round(gib, 3),
        "fits_v5e_16gib": bool(gib < 16.0),
        "backend": "XLA:TPU chipless AOT via axon TpuAotCompiler",
    }
    print(json.dumps(summary))
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[aot] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
