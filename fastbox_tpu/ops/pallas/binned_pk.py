"""Pallas TPU kernel: fused k-grid weighting + binned spectrum reduction.

This is the kernel the north star names (BASELINE.json): in a single pass
over |delta_k|^2, each x-slab computes its |k| values on the fly from three
1-D wavenumber vectors (never materialising the N^3 k-grid), digitizes them
against the bin edges with an unrolled comparison ladder, and accumulates
per-bin (sum, sum^2, count) in VMEM.  The sequential TPU grid accumulates
slab partials straight into the output block, so HBM traffic is exactly one
read of the power cube plus a few hundred bytes of output — compare the
reference's O(nbins * N^3) digitize loop (box.py:758-765).

Classification runs in SQUARED space (round 4): callers pass squared
edges — physical, or the exact integer-lattice thresholds of
``ops.spectra.kbin_thresholds`` for dtype-independent bin membership on
cubic grids (docs/conventions.md item 4).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["binned_pk_pallas", "binned_pk_half_dual_pallas"]

_LANES = 128

# Per-input-block byte budget for the dual kernel.  Scoped vmem holds the
# double-buffered input windows (2 fields x 2 buffers x 8 sublanes + 2
# broadcast rows x 2 buffers) PLUS ~4 block-sized kernel-stack temporaries
# (k, idx, wp1, mask) — altogether ~68 x CH x itemsize ~= 17x the (8, CH)
# block.  The TPU scoped limit is 16 MB: a 4.2 MB block hit 16.06 MB and a
# 2.1 MB block hit 18.67 MB (more buffers live once chunked) — both
# measured at 512^3, scripts/tpu_campaign.log followup4/5.  1 MB blocks
# put scoped usage near 9 MB; 256^3 (1.06 MB rows) stays single-chunk,
# which compiles and runs at 16 MB-limit margin (measured 3.5 ms).
# Module-level so tests can shrink it to force the chunked path.
_VMEM_BLOCK_BUDGET = 1_100_000


def _pad_half_lane(p1, p2, kz2h, wz):
    """Zero-weight pad of the half axis H up to a lane multiple.

    The (Nx, Ny*H) row layout can only be lane-chunked against the 16 MB
    scoped-VMEM limit when Ny*H divides into 128-multiples.  For N not a
    multiple of 128 (e.g. 576^3: H=289, Ny*H % 128 != 0) no chunk exists
    and the monolithic block overflows the scoped budget — the round-3
    campaign-J "scoped-VMEM OOM" failure class (docs/scaling.md).  Fix:
    pad H to the next multiple of 128 with ZERO multiplicity weight.
    Every accumulated quantity (sum w*p, sum (w*p)*p, sum w) carries the
    weight factor, so padded elements contribute exactly 0 to every bin
    regardless of where their garbage k^2 digitizes.  Costs one padded
    copy of each power cube (<= 1.45x lanes) on the N-not-128-multiple
    sizes only; 128-multiple sizes take the unpadded fast path.
    """
    H = p1.shape[2]
    Hp = ((H + 127) // 128) * 128
    pad = ((0, 0), (0, 0), (0, Hp - H))
    return (jnp.pad(p1, pad), jnp.pad(p2, pad),
            jnp.pad(kz2h, (0, Hp - H)), jnp.pad(wz, (0, Hp - H)))


def _kernel(kx2_ref, edges_ref, pk_ref, ky2_ref, kz2_ref, out_ref, *,
            nbins: int, nrows: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    pk = pk_ref[0]                       # (N, N)
    kx2 = kx2_ref[i]                     # scalar
    # Classification runs in SQUARED space: digitize(k, edges) ==
    # sum_b (edges2[b] <= k^2), sqrt-free.  With integer-unit operands
    # (ops/spectra.kbin_thresholds) the sums and compares are exact.
    k2 = kx2 + ky2_ref[:] + kz2_ref[:]   # (N, N) via broadcast

    idx = jnp.zeros(k2.shape, jnp.int32)
    for b in range(nbins):
        idx = idx + (edges_ref[b] <= k2).astype(jnp.int32)

    sums = []
    sumsqs = []
    counts = []
    for b in range(nbins):
        m = idx == b
        mf = m.astype(pk.dtype)
        sums.append(jnp.sum(jnp.where(m, pk, 0.0)))
        sumsqs.append(jnp.sum(jnp.where(m, pk * pk, 0.0)))
        counts.append(jnp.sum(mf))
    pad = [jnp.zeros((), pk.dtype)] * (_LANES - nbins)
    block = jnp.stack(
        [jnp.stack(sums + pad), jnp.stack(sumsqs + pad), jnp.stack(counts + pad)]
        + [jnp.zeros(_LANES, pk.dtype)] * (nrows - 3)
    )
    out_ref[:] += block


@partial(jax.jit, static_argnames=("interpret",))
def binned_pk_pallas(pk3d, kx2, ky2, kz2, edges2, interpret: bool = False):
    """Per-bin (sum, sumsq, count) of a power cube, digitized by |k|^2.

    Classification happens in SQUARED space (round 4): bin b collects
    elements with ``sum_e (edges2[e] <= kx2+ky2+kz2) == b``.  Pass
    physical squared edges for the legacy behaviour, or integer-unit
    squared indices + half-integer thresholds
    (``ops.spectra.kbin_thresholds(...) - 0.5``) for EXACT
    dtype-independent classification on cubic grids.

    Parameters:
        pk3d: (N, N, N) real power values |delta_k|^2 (already normalised).
        kx2, ky2, kz2: squared 1-D per-axis wavenumbers, (N,) —
            physical or integer-index units (must match ``edges2``).
        edges2: (nbins,) ascending SQUARED bin edges (max 120).
        interpret: run in the Pallas interpreter (for CPU tests).

    Returns:
        (sums, sumsqs, counts), each (nbins,), bin 0 = below edges2[0].
    """
    N = pk3d.shape[0]
    dtype = pk3d.dtype
    nbins = edges2.shape[0]
    assert nbins <= 120, "binned_pk_pallas supports at most 120 bin edges"
    nrows = 8  # f32 sublane-aligned output block

    out = pl.pallas_call(
        partial(_kernel, nbins=int(nbins), nrows=nrows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # kx2, edges
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, N, N), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nrows, _LANES), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, _LANES), dtype),
        interpret=interpret,
    )(
        kx2.astype(dtype),
        edges2.astype(dtype),
        pk3d,
        ky2.astype(dtype).reshape(N, 1),
        kz2.astype(dtype).reshape(1, N),
    )
    return out[0, :nbins], out[1, :nbins], out[2, :nbins]


def _half_dual_kernel(edges_ref, p1_ref, p2_ref, kx2_ref, kyz2_ref,
                      w_ref, out_ref, *, nbins: int, nrows: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    p1 = p1_ref[:]                       # (bx, Ny*H)
    p2 = p2_ref[:]
    w = jnp.broadcast_to(w_ref[:], p1.shape)   # (1, Ny*H) -> rows
    # Squared-space digitize (sqrt-free; exact with integer-unit
    # operands — see binned_pk_pallas / ops.spectra.kbin_thresholds)
    k2 = kx2_ref[:] + kyz2_ref[:]              # (bx,1)+(1,Ny*H)

    idx = jnp.zeros(k2.shape, jnp.int32)
    for b in range(nbins):
        idx = idx + (edges_ref[b] <= k2).astype(jnp.int32)

    wp1 = w * p1
    s1, q1, s2, cw = [], [], [], []
    for b in range(nbins):
        m = idx == b
        s1.append(jnp.sum(jnp.where(m, wp1, 0.0)))
        q1.append(jnp.sum(jnp.where(m, wp1 * p1, 0.0)))
        s2.append(jnp.sum(jnp.where(m, w * p2, 0.0)))
        cw.append(jnp.sum(jnp.where(m, w, 0.0)))
    pad = [jnp.zeros((), p1.dtype)] * (_LANES - nbins)
    block = jnp.stack(
        [jnp.stack(s1 + pad), jnp.stack(q1 + pad), jnp.stack(s2 + pad),
         jnp.stack(cw + pad)]
        + [jnp.zeros(_LANES, p1.dtype)] * (nrows - 4)
    )
    out_ref[:] += block


@partial(jax.jit, static_argnames=("interpret",))
def binned_pk_half_dual_pallas(p1, p2, kx2, ky2, kz2h, wz, edges2,
                               interpret: bool = False):
    """Weighted dual-field binned reduction on an rfftn half spectrum.

    Fuses |k| construction, digitize, and the per-bin accumulation of TWO
    power fields sharing the same bins into one pass — the Pallas
    replacement for ``ops.reduce.binned_weighted_dual`` plus the
    precomputed ``searchsorted`` pass in the pipeline's step (9).  The
    sequential slab accumulation in VMEM is ~1e3x more accurate in f32
    than the XLA one-hot scan (measured 3.9e-7 vs 4.9e-4 max rel err at
    256^3; scripts/check_binned_pk_accuracy.py).

    Layout: the (Nx, Ny, H) half cube is processed as (Nx, Ny*H) rows —
    Ny*H is lane-aligned when Ny is a multiple of 128 (256*129 = 258
    lanes), where (Nx, Ny, H) blocks would pad H=129 up to 256 lanes and
    nearly double the VPU work (measured 2 ms/pipeline at 256^3).  The
    ky^2+kz^2 row and the Hermitian multiplicity row are built once on
    the host side of the trace.

    Parameters:
        p1, p2: (Nx, Ny, H) real power values on the half spectrum.
        kx2, ky2: squared 1-D wavenumbers, (Nx,), (Ny,) — physical or
            exact integer-index units (must match ``edges2``).
        kz2h: squared kz on the half axis, (H,).
        wz: per-kz-plane Hermitian multiplicity weights, (H,).
        edges2: (nbins,) ascending SQUARED bin edges (max 120) — e.g.
            ``kbin_thresholds(grid, edges) - 0.5`` for the exact
            integer-lattice classification on cubic grids.

    Returns:
        (sum w*p1, sum w*p1^2, sum w*p2, sum w) per bin, each (nbins,);
        bin b collects squared-space digitize == b (bin 0 = below
        edges2[0]).
    """
    Nx, Ny, H = p1.shape
    assert p2.shape == p1.shape, (p1.shape, p2.shape)
    dtype = p1.dtype
    nbins = edges2.shape[0]
    assert nbins <= 120, "binned_pk_half_dual_pallas: at most 120 bin edges"
    nrows = 8
    NH = Ny * H
    bx = 8
    while Nx % bx != 0:
        bx //= 2          # tiny test grids: bx == Nx (== full dim, allowed)
    itemsize0 = jnp.dtype(dtype).itemsize
    if bx * NH * itemsize0 > _VMEM_BLOCK_BUDGET and NH % 128 != 0:
        # Over-budget block that cannot be lane-chunked: zero-weight pad
        # the half axis to a 128-multiple first (see _pad_half_lane).
        p1, p2, kz2h, wz = _pad_half_lane(p1, p2, kz2h, wz)
        H = p1.shape[2]
        NH = Ny * H
    nblk = Nx // bx
    # Lane chunking: the unrolled digitize + masked reductions hold ~4
    # block-sized f32 temporaries on the kernel stack (k, idx, wp1, mask),
    # and the TPU scoped-vmem limit is 16 MB — an (8, 512*257) block is
    # 4.2 MB and overflows it by 64 KB at 512^3 (measured,
    # scripts/tpu_campaign.log followup4).  The sublane dim must stay a
    # multiple of 8, so split the LANE dim instead: pick the smallest
    # chunk count nc where the chunk stays a multiple of 128 (Pallas
    # lowering constraint) and the block fits a 2.5 MB budget.
    itemsize = jnp.dtype(dtype).itemsize
    nc = 1
    if bx * NH * itemsize > _VMEM_BLOCK_BUDGET and NH % 128 == 0:
        for cand in range(2, NH // 128 + 1):
            if NH % cand == 0 and (NH // cand) % 128 == 0:
                nc = cand
                if bx * (NH // cand) * itemsize <= _VMEM_BLOCK_BUDGET:
                    break
    CH = NH // nc

    kyz2 = (ky2.astype(dtype)[:, None]
            + kz2h.astype(dtype)[None, :]).reshape(1, NH)
    wrow = jnp.broadcast_to(wz.astype(dtype)[None, :], (Ny, H)).reshape(1, NH)

    out = pl.pallas_call(
        partial(_half_dual_kernel, nbins=int(nbins), nrows=nrows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,   # edges
            grid=(nblk, nc),
            in_specs=[
                pl.BlockSpec((bx, CH), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bx, CH), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bx, 1), lambda i, j, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CH), lambda i, j, *_: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CH), lambda i, j, *_: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nrows, _LANES), lambda i, j, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, _LANES), dtype),
        interpret=interpret,
    )(
        edges2.astype(dtype),
        p1.reshape(Nx, NH),
        p2.reshape(Nx, NH),
        kx2.astype(dtype).reshape(Nx, 1),
        kyz2,
        wrow,
    )
    return out[0, :nbins], out[1, :nbins], out[2, :nbins], out[3, :nbins]
