"""Pallas TPU kernel v2: dual binned-P(k) reduction with hoisted counts.

Two refinements over ``binned_pk.binned_pk_half_dual_pallas`` (which
stays the shipping default until the TPU microbench + truth gate admit
this one):

1. **Hoisted counts** — the weighted bin populations ``sum w`` are
   realisation-INDEPENDENT (pure geometry: grid + edges), yet the v1
   kernel re-accumulates them per call, paying one of its four masked
   reduction passes for a constant.  Callers precompute them once at
   build time (``ops.spectra`` helpers give exact integer-lattice
   classification) and this kernel returns only the three
   realisation-dependent sums.  Identical summation order for those
   three -> BIT-IDENTICAL s1/q1/s2 vs v1.

2. **Telescoped digitize** (``telescoped=True``, opt-in) — instead of
   materialising ``idx`` (nbins compare+adds) and re-testing ``idx == b``
   per bin, accumulate LESS-THAN prefix sums ``S(b) = sum_{k2 < e_b} q``
   (one compare + mask per bin) and difference adjacent prefixes on the
   host side of the call.  ~1.7x fewer VPU ops per element.  The
   differencing changes the summation order: low bins are differences of
   SMALL prefixes (accurate); the top-of-prefix cancellation error is
   bounded by eps * prefix/bin, which stays O(10) * eps because bin
   populations grow ~k^3 (the last bin dominates its own prefix).
   Gate before shipping.

Layout identical to v1: (Nx, Ny*H) rows, lane chunking against the
16 MB scoped-VMEM limit.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binned_pk import _LANES, _VMEM_BLOCK_BUDGET, _pad_half_lane

__all__ = ["binned_pk_half_dual_pallas_v2"]


def _kernel_v2(edges_ref, p1_ref, p2_ref, kx2_ref, kyz2_ref, w_ref,
               out_ref, *, nbins: int, nrows: int, telescoped: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    p1 = p1_ref[:]
    p2 = p2_ref[:]
    w = jnp.broadcast_to(w_ref[:], p1.shape)
    k2 = kx2_ref[:] + kyz2_ref[:]

    wp1 = w * p1
    q1v = wp1 * p1
    wp2 = w * p2

    s1, q1, s2 = [], [], []
    if telescoped:
        # Prefix sums over k2 < e_b; bin b = prefix(b+1) - prefix(b),
        # differenced host-side.  Slot b holds prefix(b); the last slot
        # (nbins-1 edges are exclusive uppers) holds the total.
        for b in range(nbins):
            m = k2 < edges_ref[b]
            s1.append(jnp.sum(jnp.where(m, wp1, 0.0)))
            q1.append(jnp.sum(jnp.where(m, q1v, 0.0)))
            s2.append(jnp.sum(jnp.where(m, wp2, 0.0)))
    else:
        idx = jnp.zeros(k2.shape, jnp.int32)
        for b in range(nbins):
            idx = idx + (edges_ref[b] <= k2).astype(jnp.int32)
        for b in range(nbins):
            m = idx == b
            s1.append(jnp.sum(jnp.where(m, wp1, 0.0)))
            q1.append(jnp.sum(jnp.where(m, q1v, 0.0)))
            s2.append(jnp.sum(jnp.where(m, wp2, 0.0)))
    pad = [jnp.zeros((), p1.dtype)] * (_LANES - nbins)
    block = jnp.stack(
        [jnp.stack(s1 + pad), jnp.stack(q1 + pad), jnp.stack(s2 + pad)]
        + [jnp.zeros(_LANES, p1.dtype)] * (nrows - 3)
    )
    out_ref[:] += block


@partial(jax.jit, static_argnames=("telescoped", "interpret"))
def binned_pk_half_dual_pallas_v2(p1, p2, kx2, ky2, kz2h, wz, edges2,
                                  telescoped: bool = False,
                                  interpret: bool = False):
    """Dual binned reduction WITHOUT the count pass (see module docstring).

    Same classification contract as v1 (squared-space digitize; exact
    with integer-lattice operands).  Returns (s1, q1, s2) per bin; the
    caller supplies the precomputed weighted counts.
    """
    Nx, Ny, H = p1.shape
    assert p2.shape == p1.shape, (p1.shape, p2.shape)
    dtype = p1.dtype
    nbins = edges2.shape[0]
    assert nbins <= 120, "binned_pk_half_dual_pallas_v2: at most 120 edges"
    nrows = 8
    NH = Ny * H
    bx = 8
    while Nx % bx != 0:
        bx //= 2
    itemsize = jnp.dtype(dtype).itemsize
    if bx * NH * itemsize > _VMEM_BLOCK_BUDGET and NH % 128 != 0:
        # Zero-weight lane pad for N not a multiple of 128 (see
        # binned_pk._pad_half_lane) — enables the chunk search below.
        p1, p2, kz2h, wz = _pad_half_lane(p1, p2, kz2h, wz)
        H = p1.shape[2]
        NH = Ny * H
    nblk = Nx // bx
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
        partial(_kernel_v2, nbins=int(nbins), nrows=nrows,
                telescoped=telescoped),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
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
    s1, q1, s2 = out[0], out[1], out[2]
    if telescoped:
        # prefix(b) holds sum_{k2 < e_b}; slot for bin b (digitize == b,
        # b in [0, nbins]) is prefix(b+1) - prefix(b) with prefix(0) = 0
        # and the overflow bin (>= last edge) unrepresented here — the
        # pipeline only consumes bins [0, nbins), matching v1's slots.
        pref = jnp.concatenate([jnp.zeros((1,), dtype), s1[:nbins]])
        s1b = pref[1:] - pref[:-1]
        prefq = jnp.concatenate([jnp.zeros((1,), dtype), q1[:nbins]])
        q1b = prefq[1:] - prefq[:-1]
        pref2 = jnp.concatenate([jnp.zeros((1,), dtype), s2[:nbins]])
        s2b = pref2[1:] - pref2[:-1]
        return s1b, q1b, s2b
    return s1[:nbins], q1[:nbins], s2[:nbins]
