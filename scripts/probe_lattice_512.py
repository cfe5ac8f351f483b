#!/usr/bin/env python
"""Which lattice-CIC kernels compile (and how fast do they run) at 512^3?

Round-5 finding: COLA >= 512^3 had NEVER compiled — the (bx, N, N)
slab blocks at N=512 are 4x the 256^3 blocks, and the resident z-plane
stacks pushed every banded kernel past the 128 MB physical VMEM
("Used 200.60M of 128.00M", scripts/round5b.log).  After the round-5
mitigations (open-band bx floor B, on-the-fly z weights at >= 2 MB
blocks, 127 MB limits) this probe compiles + times each
(kernel, band) cell IN A FRESH SUBPROCESS (a failed compile poisons
the TPU client) and writes LATTICE_512.json, from which the engine's
N-aware fuse policy is set (fields/cola.py).

    python scripts/probe_lattice_512.py --nsamp 512
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time, os
import jax, jax.numpy as jnp
os.makedirs(os.path.expanduser("~/.cache/jax_fastbox"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import fastbox_tpu
fastbox_tpu.ensure_platform()
from fastbox_tpu.ops.pallas import lattice_cic as plc

N = int(sys.argv[1]); kernel = sys.argv[2]; B = int(sys.argv[3])
key = jax.random.PRNGKey(0)
# strictly-open-band displacements: |d| < B
disp = jax.random.uniform(key, (N, N, N, 3), jnp.float32,
                          -(B - 0.01), B - 0.01)
mesh = jax.random.normal(jax.random.PRNGKey(1), (N, N, N), jnp.float32)
t0 = time.perf_counter()
if kernel == "paint":
    out = plc.cic_paint_lattice_pallas(disp, B=B, openband=True)
elif kernel == "gather":
    out = plc.cic_gather_lattice_pallas(mesh, disp, B=B, openband=True)
else:
    out = plc.cic_gather3_lattice_pallas((mesh, mesh, mesh), disp, B=B,
                                         openband=True)[0]
out.block_until_ready()
t_first = time.perf_counter() - t0
# steady-state: chain 5 dependent calls in one jit, read back a scalar
@jax.jit
def chain(m, d):
    for _ in range(5):
        if kernel == "paint":
            m = plc.cic_paint_lattice_pallas(d, B=B, openband=True)
        elif kernel == "gather":
            m = plc.cic_gather_lattice_pallas(m, d, B=B, openband=True)
        else:
            a, b, c = plc.cic_gather3_lattice_pallas((m, m, m), d, B=B,
                                                     openband=True)
            m = a + b + c
    return jnp.sum(m)
s = chain(mesh, disp); float(s)
t0 = time.perf_counter()
s = chain(mesh, disp); float(s)
dt = (time.perf_counter() - t0) / 5.0
print(json.dumps({"ok": True, "kernel": kernel, "B": B, "N": N,
                  "t_first_s": round(t_first, 2),
                  "ms_per_op": round(dt * 1e3, 2)}), flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsamp", type=int, default=512)
    ap.add_argument("--bands", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--kernels", nargs="+",
                    default=["paint", "gather", "gather3"])
    ap.add_argument("--timeout", type=float, default=1500.0)
    ap.add_argument("--out", default=os.path.join(REPO, "LATTICE_512.json"))
    args = ap.parse_args()

    results = []
    for kernel in args.kernels:
        for B in args.bands:
            print(f"[lat] {kernel} B={B} {args.nsamp}^3 ...", flush=True)
            try:
                p = subprocess.run(
                    [sys.executable, "-c", CHILD, str(args.nsamp), kernel,
                     str(B)], cwd=REPO, capture_output=True, text=True,
                    timeout=args.timeout)
            except subprocess.TimeoutExpired:
                results.append({"ok": False, "kernel": kernel, "B": B,
                                "error": f"timeout {args.timeout:.0f}s"})
                print(f"[lat] {kernel} B={B} TIMEOUT", flush=True)
                continue
            line = [l for l in p.stdout.splitlines() if l.startswith('{"ok"')]
            if p.returncode == 0 and line:
                rec = json.loads(line[-1])
                results.append(rec)
                print(f"[lat] {kernel} B={B} OK {rec['ms_per_op']} ms",
                      flush=True)
            else:
                tail = (p.stderr or p.stdout).strip().splitlines()
                err = next((l for l in reversed(tail)
                            if "vmem" in l.lower() or "Error" in l
                            or "RESOURCE" in l), tail[-1] if tail else "?")
                results.append({"ok": False, "kernel": kernel, "B": B,
                                "error": err.strip()[:300]})
                print(f"[lat] {kernel} B={B} FAILED: {err.strip()[:160]}",
                      flush=True)

    with open(args.out, "w") as f:
        json.dump({"nsamp": args.nsamp, "results": results}, f, indent=1)
    print(f"[lat] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
