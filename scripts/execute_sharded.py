#!/usr/bin/env python
"""EXECUTE the sharded ensemble step at a given size on the virtual CPU
mesh and record run evidence (wall-clock, peak RSS, output P(k)).

VERDICT round-4 #4: SCALING_1024.json was a *compile* artifact only —
1024^3 had never been executed anywhere.  This script runs ONE sharded
step (the same program compile_1024.py lowers) and appends an
``execution`` section to the JSON:

    python scripts/execute_sharded.py --nsamp 512  --out /tmp/exec512.json
    python scripts/execute_sharded.py --nsamp 1024 --out SCALING_1024.json

On the single-core host this is hours at 1024^3 — that is acceptable;
the point is upgrading the claim from "lowers" to "runs".  Launch under
``ulimit -v`` so an over-RAM attempt dies with a recorded bad_alloc
instead of triggering the machine OOM killer (the runner shell does
this; see docs/scaling.md).
"""
import argparse
import json
import os
import resource
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


def _peak_rss_gib():
    # ru_maxrss is KiB on Linux
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsamp", type=int, default=1024)
    ap.add_argument("--space", type=int, default=8)
    ap.add_argument("--ens", type=int, default=1)
    # 8 Gpc keeps the frequency channels positive at every N (a 20 Gpc
    # box pushes freq_array through zero -> NaN foreground spectral
    # factors; observed in the first 512^3 CPU-mesh execution probe).
    ap.add_argument("--box", type=float, default=8e3)
    ap.add_argument("--out", default=None,
                    help="JSON file; if it exists its compile-side keys "
                         "are preserved and an 'execution' section is "
                         "added/updated")
    args = ap.parse_args()

    ndev = args.space * args.ens
    devs = np.array(jax.devices()[:ndev]).reshape(args.ens, args.space)
    mesh = Mesh(devs, ("ens", "space"))
    grid = GridSpec.create(box_scale=(args.box,) * 3, nsamp=args.nsamp,
                           redshift=0.8)
    cosmology = build_cosmology(
        dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8),
        redshift=0.8)
    config = PipelineConfig(dtype="float32")
    fn = make_sharded_ensemble_step(mesh, grid, cosmology, config)

    keys = jax.device_put(
        jax.random.split(jax.random.PRNGKey(0), args.ens),
        NamedSharding(mesh, P("ens")))

    execution = {
        "nsamp": args.nsamp,
        "mesh": {"ens": args.ens, "space": args.space},
        "host": "single-core CPU, 8 virtual devices, 125 GiB RAM",
    }
    print(f"[exec] compiling {args.nsamp}^3 over "
          f"{{'ens': {args.ens}, 'space': {args.space}}} ...", flush=True)
    t0 = time.perf_counter()
    try:
        compiled = fn.lower(keys).compile()
        execution["compile_seconds"] = round(time.perf_counter() - t0, 1)
        print(f"[exec] compiled in {execution['compile_seconds']}s; "
              "executing ONE step ...", flush=True)
        t0 = time.perf_counter()
        out = compiled(keys)
        pk = np.asarray(out["pk_cleaned"])
        sig = np.asarray(out["sigma_data"])
        execution["executed"] = True
        execution["step_seconds"] = round(time.perf_counter() - t0, 1)
        execution["peak_rss_gib"] = round(_peak_rss_gib(), 2)
        execution["pk_cleaned_shape"] = list(pk.shape)
        # Empty bins are NaN by the reference's own convention
        # (box.py:761-768 mean of an empty digitize class) — report the
        # count rather than a blanket all-finite flag.
        execution["pk_finite_bins"] = int(np.isfinite(pk).sum())
        execution["pk_nan_bins"] = int((~np.isfinite(pk)).sum())
        execution["pk_cleaned_head"] = [float(v) for v in pk.reshape(-1)[:4]]
        execution["sigma_data"] = [float(v) for v in sig.reshape(-1)]
        print(f"[exec] step: {execution['step_seconds']}s, peak RSS "
              f"{execution['peak_rss_gib']} GiB, pk shape {pk.shape}, "
              f"finite bins {execution['pk_finite_bins']}", flush=True)
    except MemoryError as e:
        execution["executed"] = False
        execution["error"] = f"MemoryError after {time.perf_counter()-t0:.0f}s"
        execution["peak_rss_gib"] = round(_peak_rss_gib(), 2)
        print(f"[exec] FAILED: {e}", flush=True)
    except Exception as e:  # RESOURCE_EXHAUSTED surfaces as XlaRuntimeError
        execution["executed"] = False
        execution["error"] = f"{type(e).__name__}: {str(e)[:500]}"
        execution["peak_rss_gib"] = round(_peak_rss_gib(), 2)
        print(f"[exec] FAILED: {execution['error']}", flush=True)

    if args.out:
        doc = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                doc = json.load(f)
        doc["execution"] = execution
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"[exec] wrote {args.out}", flush=True)
    print(json.dumps(execution))


if __name__ == "__main__":
    main()
