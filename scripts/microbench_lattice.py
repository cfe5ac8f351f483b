"""Per-op TPU timing of the lattice-CIC Pallas kernels at B=2 vs B=3.

The round-2 finding: ~11 ms/op at B=2 but ~80 ms/op at B=3 (256^3) — a
7x cliff against a 2.4x work ratio ((2B+2)^3 terms), attributed to the
B=3 live set (3x (2B+2) precomputed weight planes) spilling VMEM.  The
round-3 kernel computes y-axis weights on the fly from hoisted
floor/frac (the planes were single-use); this measures the effect.

    python scripts/microbench_lattice.py            # N=256
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))

import jax.numpy as jnp
import numpy as np

import fastbox_tpu

fastbox_tpu.ensure_platform()

from fastbox_tpu.ops.pallas.lattice_cic import (cic_gather_lattice_pallas,
                                                cic_paint_lattice_pallas)

N = int(os.environ.get("NSAMP", "256"))
K = int(os.environ.get("K", "4"))

key = jax.random.PRNGKey(0)
disp = 1.5 * jax.random.normal(key, (N, N, N, 3), jnp.float32)
disp = jnp.clip(disp, -1.9, 1.9)


def timed(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out[:1, :1, :4])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(K):
        out = fn(*args)
    np.asarray(out[:1, :1, :4])
    dt = (time.perf_counter() - t0) / K
    print(f"{name:34s} {dt * 1000:8.2f} ms/op  (compile+warm {tc:.1f}s)",
          flush=True)
    return out


VARIANTS = os.environ.get("VARIANTS", "z,y,g3z,g3y").split(",")
BANDS = tuple(int(b) for b in os.environ.get("BANDS", "2,3").split(","))

for B in BANDS:
    d = jnp.clip(disp, -(B - 0.1), B - 0.1)

    paint = jax.jit(lambda dd, B=B: cic_paint_lattice_pallas(dd, B=B))
    mesh = timed(f"paint  B={B}", paint, d)
    if "open" in VARIANTS:
        paint_o = jax.jit(lambda dd, B=B: cic_paint_lattice_pallas(
            dd, B=B, openband=True))
        mesh_o = timed(f"paint  B={B} openband", paint_o, d)
        err = float(jnp.max(jnp.abs(mesh_o - mesh)))
        print(f"  paint B={B} openband max|err| vs closed: {err:.2e}",
              flush=True)
        gather_o = jax.jit(lambda m, dd, B=B: cic_gather_lattice_pallas(
            m, dd, B=B, openband=True))
        timed(f"gather B={B} openband", gather_o, mesh, d)
        from fastbox_tpu.ops.pallas.lattice_cic import (
            cic_gather3_lattice_pallas as _g3o)
        g3o = jax.jit(lambda m, dd, B=B: _g3o((m, m, m), dd, B=B,
                                              openband=True)[0])
        timed(f"gather3 B={B} openband (3 meshes)", g3o, mesh, d)
    if "y" in VARIANTS:
        paint_y = jax.jit(
            lambda dd, B=B: cic_paint_lattice_pallas(dd, B=B, inner="y"))
        timed(f"paint  B={B} inner=y", paint_y, d)

    gather = jax.jit(lambda m, dd, B=B: cic_gather_lattice_pallas(m, dd, B=B))
    timed(f"gather B={B}", gather, mesh, d)
    if "y" in VARIANTS:
        gather_y = jax.jit(lambda m, dd, B=B: cic_gather_lattice_pallas(
            m, dd, B=B, inner="y"))
        timed(f"gather B={B} inner=y", gather_y, mesh, d)
    for tag, inner in (("g3z", "z"), ("g3y", "y")):
        if tag in VARIANTS:
            from fastbox_tpu.ops.pallas.lattice_cic import (
                cic_gather3_lattice_pallas)

            g3 = jax.jit(lambda m, dd, B=B, i=inner:
                         cic_gather3_lattice_pallas((m, m, m), dd, B=B,
                                                    inner=i)[0])
            timed(f"gather3 B={B} inner={inner} (3 meshes)", g3, mesh, d)

    # correctness spot check vs the XLA roll formulation at small N
    if N <= 128:
        from fastbox_tpu.fields.lattice_cic import cic_paint_lattice

        ref = cic_paint_lattice(d, B=B)
        err = float(jnp.max(jnp.abs(mesh - ref)))
        print(f"  paint B={B} max|err| vs XLA roll: {err:.2e}", flush=True)
print("total mass check:", float(jnp.sum(mesh)), "expected", float(N**3),
      flush=True)
