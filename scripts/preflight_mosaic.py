"""Preflight: cross-lower every Pallas kernel for the TPU target on the
CPU host (jax.export with platforms=("tpu",)).

Catches Mosaic lowering rejections — e.g. the block-shape tiling rule
(last two block dims must be multiples of (8, 128) or equal the array
dims) — WITHOUT burning a TPU round trip + remote compile.  Run before
any TPU campaign that exercises new/changed kernels:

    python scripts/preflight_mosaic.py
"""
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

FAILED = []


def pre(name, fn, *args):
    try:
        jax.export.export(jax.jit(fn), platforms=("tpu",))(*args)
        print(f"{name:34s} lowering OK", flush=True)
    except Exception as e:
        FAILED.append(name)
        print(f"{name:34s} FAIL {type(e).__name__}: {str(e)[:240]}",
              flush=True)


def main():
    from fastbox_tpu.ops.pallas.binned_pk import binned_pk_half_dual_pallas
    from fastbox_tpu.ops.pallas.mmdft import dft_c2c_axis_pallas
    from fastbox_tpu.ops.pallas.noise import add_scaled_normal_pallas
    from fastbox_tpu.ops.pallas.rsd_fused import (rsd_bracket_interp_pallas,
                                                  rsd_remap_wrap_pallas)

    for N in (256, 512):
        H = N // 2 + 1
        xr = jnp.zeros((N, N, H), jnp.float32)
        pre(f"mmdft axis1 C={N}",
            lambda a, b: dft_c2c_axis_pallas(a, b, 1, -1), xr, xr)
        if N <= 256:
            pre(f"mmdft axis0 C={N}",
                lambda a, b: dft_c2c_axis_pallas(a, b, 0, -1), xr, xr)

        M, C = N * N, N
        vals = jnp.zeros((M, C), jnp.float32)
        zt = jnp.arange(C, dtype=jnp.float32)
        fill = jnp.zeros((M,), jnp.float32)
        for band in (2, 4):
            pre(f"rsd wrap band{band} N={N}",
                lambda v, w, b=band: rsd_remap_wrap_pallas(
                    v, w, zt, fill, 0.0, float(C - 1), 0.01, band=b),
                vals, vals)
        pre(f"rsd bracket N={N}",
            lambda s, v: rsd_bracket_interp_pallas(s, v, zt, fill, band=4),
            vals, vals)
        pre(f"noise return_max N={N}",
            lambda x: add_scaled_normal_pallas(
                x, jnp.ones((C,), jnp.float32), jnp.int32(7),
                return_max=True), vals)

        from fastbox_tpu.ops.pallas.half_draw import (
            colored_complex_normal_pallas)

        amp2d = jnp.ones((N, N * H), jnp.float32)
        pre(f"colored half draw N={N}",
            lambda a: colored_complex_normal_pallas(a, jnp.int32(5)), amp2d)

        from fastbox_tpu.ops.pallas.half_draw import (
            colored_complex_normal_vz_pallas)

        kx2c = jnp.ones((N, 1), jnp.float32)
        kyzr = jnp.ones((1, N * H), jnp.float32)
        kznr = jnp.ones((1, N * H), jnp.float32)
        pre(f"colored half draw+vz N={N}",
            lambda a: colored_complex_normal_vz_pallas(
                a, kx2c, kyzr, kznr, jnp.int32(5)), amp2d)

        kx2 = jnp.zeros((N,), jnp.float32)
        kz2 = jnp.zeros((H,), jnp.float32)
        wz = jnp.ones((H,), jnp.float32)
        edges = jnp.linspace(0.01, 1.0, 20)
        pre(f"binned_pk dual N={N}",
            lambda p: binned_pk_half_dual_pallas(p, p, kx2, kx2, kz2, wz,
                                                 edges.astype(jnp.float32)),
            xr)

    # Non-128-multiple N (round 5: 576^3 support) — the fused RSD wrap
    # kernels at C=576, the sorted exact fallback, and the padded
    # binned-pk path all must lower for the 576^3 pipeline to ride the
    # Pallas paths instead of the HBM-OOMing XLA fallbacks.
    from fastbox_tpu.ops.pallas.rsd_interp import interp_sorted_pallas

    N = 576
    H = N // 2 + 1
    M, C = N * N, N
    vals = jnp.zeros((M, C), jnp.float32)
    zt = jnp.arange(C, dtype=jnp.float32)
    fill = jnp.zeros((M,), jnp.float32)
    for band in (2, 4):
        pre(f"rsd wrap band{band} N={N}",
            lambda v, w, b=band: rsd_remap_wrap_pallas(
                v, w, zt, fill, 0.0, float(C - 1), 0.01, band=b),
            vals, vals)
    pre(f"rsd sorted-exact N={N}",
        lambda s, v: interp_sorted_pallas(s, v, zt, fill), vals, vals)
    pre(f"noise return_max N={N}",
        lambda x: add_scaled_normal_pallas(
            x, jnp.ones((C,), jnp.float32), jnp.int32(7),
            return_max=True), vals)
    xr576 = jnp.zeros((N, N, H), jnp.float32)
    kx2 = jnp.zeros((N,), jnp.float32)
    kz2 = jnp.zeros((H,), jnp.float32)
    wz = jnp.ones((H,), jnp.float32)
    edges = jnp.linspace(0.01, 1.0, 20)
    pre(f"binned_pk dual N={N} (lane-padded)",
        lambda p: binned_pk_half_dual_pallas(p, p, kx2, kx2, kz2, wz,
                                             edges.astype(jnp.float32)),
        xr576)
    from fastbox_tpu.ops.pallas.binned_pk_v2 import (
        binned_pk_half_dual_pallas_v2)

    pre(f"binned_pk v2 N={N} (lane-padded)",
        lambda p: binned_pk_half_dual_pallas_v2(p, p, kx2, kx2, kz2, wz,
                                                edges.astype(jnp.float32)),
        xr576)

    # Lattice CIC kernels (fields/cola.py engine): open-band (round 4,
    # 2B+1 offsets/axis, the strict-ladder fast path) and closed-band.
    from fastbox_tpu.ops.pallas.lattice_cic import (
        cic_gather3_lattice_pallas,
        cic_gather_lattice_pallas,
        cic_paint_lattice_pallas,
    )

    NL = 256
    dl = jnp.zeros((NL, NL, NL, 3), jnp.float32)
    ml = jnp.zeros((NL, NL, NL), jnp.float32)
    for B in (1, 2, 3):
        for ob in (True, False):
            tag = "open" if ob else "closed"
            pre(f"lattice paint B={B} {tag} N={NL}",
                lambda d, B=B, ob=ob: cic_paint_lattice_pallas(
                    d, B=B, openband=ob), dl)
            pre(f"lattice gather B={B} {tag} N={NL}",
                lambda m, d, B=B, ob=ob: cic_gather_lattice_pallas(
                    m, d, B=B, openband=ob), ml, dl)
            pre(f"lattice gather3 B={B} {tag} N={NL}",
                lambda m, d, B=B, ob=ob: cic_gather3_lattice_pallas(
                    (m, m, m), d, B=B, openband=ob)[0], ml, dl)

    if FAILED:
        print(f"\nPREFLIGHT FAILED: {FAILED}", flush=True)
        sys.exit(1)
    print("\nall kernels lower for TPU", flush=True)


if __name__ == "__main__":
    main()
