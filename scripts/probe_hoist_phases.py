"""Phase-level timing of the chained eigh hoist (PipelineConfig.eigh_hoist).

The hoist should turn K latency-bound sequential (C, C) eighs into one
batched decomposition; the first uncontrolled bench showed a wash
instead (99.85 vs ~101 pipelines/s at 256^3).  This probe separates the
candidate explanations by timing, in ONE process on the TPU:

  1. chained pipeline, hoist OFF      (the incumbent)
  2. chained pipeline, hoist ON       (the candidate)
  3. K sequential eighs inside a scan (what the incumbent pays)
  4. one batched (K, C, C) eigh       (what the hoist pays)
  5. scan-materialise + re-read of a (K, N, N, N) stack (structure tax)

Timing rules (CLAUDE.md): chain work inside one jit with data
dependencies, then force a host materialisation; block_until_ready
returns early through the axon tunnel.

Run from the repo root: python scripts/probe_hoist_phases.py --nsamp 256
"""
import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import fastbox_tpu

fastbox_tpu.ensure_platform()


def timed(name, fn, *args, reps=8):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt * 1000:9.2f} ms  (compile+warm {tc:.1f}s)",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsamp", type=int, default=256)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--box", type=float, default=4e3)
    args = ap.parse_args()
    N, K = args.nsamp, args.chain
    C = N

    from fastbox_tpu.cosmology import build_cosmology
    from fastbox_tpu.grid import GridSpec
    from fastbox_tpu.pipeline import PipelineConfig, make_chained_pipeline

    grid = GridSpec.create(box_scale=(args.box,) * 3, nsamp=N, redshift=0.8)
    cosmo = build_cosmology(
        dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8), 0.8)
    keys = jax.random.split(jax.random.PRNGKey(0), K)

    for hoist in ("off", "on"):
        fn = make_chained_pipeline(
            grid, cosmo, PipelineConfig(dtype="float32", eigh_hoist=hoist))
        dt = timed(f"chained K={K} eigh_hoist={hoist}",
                   lambda: fn(keys), reps=4)
        print(f"  -> {K / dt:8.2f} pipelines/s", flush=True)

    # Isolated eigh costs on realistic covariance-like matrices
    A = jax.random.normal(jax.random.PRNGKey(1), (K, C, 64), jnp.float32)
    covs = jnp.einsum("kcp,kdp->kcd", A, A) + 1e-3 * jnp.eye(C)

    @jax.jit
    def eigh_seq(covs):
        def body(carry, cv):
            _, v = jnp.linalg.eigh(cv)
            return carry, v[:, -4:].sum()

        _, outs = jax.lax.scan(body, None, covs)
        return outs

    @jax.jit
    def eigh_batched(covs):
        _, v = jnp.linalg.eigh(covs)
        return v[:, :, -4:].sum(axis=(1, 2))

    timed(f"scan of {K} sequential eigh({C}x{C})", eigh_seq, covs)
    timed(f"one batched eigh({K},{C},{C})", eigh_batched, covs)

    # Structure tax: materialise a (K, N, N, N) stack from a scan and
    # re-read it in a second scan (the hoist's extra HBM round trips)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (N, N, N), jnp.float32)

    @jax.jit
    def two_scans(x0):
        def body_a(c, i):
            return c, x0 * (1.0 + 1e-6 * i)

        _, stack = jax.lax.scan(body_a, None, jnp.arange(K, dtype=jnp.float32))

        def body_b(c, cube):
            return c, jnp.sum(cube)

        _, sums = jax.lax.scan(body_b, None, stack)
        return sums

    @jax.jit
    def one_scan(x0):
        def body(c, i):
            return c, jnp.sum(x0 * (1.0 + 1e-6 * i))

        _, sums = jax.lax.scan(body, None, jnp.arange(K, dtype=jnp.float32))
        return sums

    ta = timed(f"two-scan stack round trip (K={K}, {N}^3)", two_scans, x0)
    tb = timed(f"one-scan fused control (K={K}, {N}^3)", one_scan, x0)
    print(f"  -> structure tax ~ {(ta - tb) * 1000 / K:6.3f} ms/pipeline",
          flush=True)


if __name__ == "__main__":
    main()
