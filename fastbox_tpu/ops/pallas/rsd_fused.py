"""Pallas TPU kernel: fused per-LOS sort + banded interpolation for RSD.

One kernel, one HBM read of (s, v) and one write of the output:

  1. a full bitonic sort_key_val across lanes (XOR-partner compare-exchange
     via lane rotates) — data-independent, so periodic-wrap jumps and
     shell crossings sort correctly with no assumptions;
  2. the banded telescoping interpolation of ops/pallas/banded_interp.py
     on the sorted nodes;
  3. the griddata hull fill (box.py:429-437 semantics);
  4. a per-block validity flag: max |s_sorted[i] - z[i]| <= band * dz.
     Callers lax.cond on the AND of the flags and recompute with the exact
     full kernel for the (physically absurd) realisations that violate it.

This replaces the XLA bitonic sort (whose sorted output round-trips HBM)
plus the separate interp kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rsd_sort_interp_pallas"]

_BLOCK_M = 256


def _xor_partner(x, j: int, C: int, lane):
    """Value at lane XOR j via two lane-rotates + select."""
    left = pltpu.roll(x, (C - j) % C, 1)   # value at lane + j
    right = pltpu.roll(x, j % C, 1)        # value at lane - j
    bit = (lane & j) == 0
    return jnp.where(bit, left, right)


def _bitonic_sort_kv(s, v, C: int, lane):
    """Ascending bitonic sort of each row's (s, v) pairs across lanes."""
    k = 2
    while k <= C:
        j = k // 2
        while j >= 1:
            ps = _xor_partner(s, j, C, lane)
            pv = _xor_partner(v, j, C, lane)
            is_lo = (lane & j) == 0
            up = (lane & k) == 0
            # strict comparisons: ties never swap (consistent on both
            # sides).  Plain logical ops — Mosaic cannot lower a select
            # between boolean vectors (i8 -> i1 truncation).
            gt = s > ps
            lt = s < ps
            swap_up = (is_lo & gt) | (~is_lo & lt)
            swap_dn = (is_lo & lt) | (~is_lo & gt)
            swap = (up & swap_up) | (~up & swap_dn)
            s = jnp.where(swap, ps, s)
            v = jnp.where(swap, pv, v)
            j //= 2
        k *= 2
    return s, v


def _kernel(z_ref, s_ref, v_ref, fill_ref, out_ref, ok_ref, *,
            C: int, band: int, tol: float):
    z = z_ref[:]                          # (1, C)
    dtype = v_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, s_ref.shape, 1)

    @pl.when(pl.program_id(0) == 0)
    def _():
        ok_ref[0, 0] = jnp.int32(1)

    s, v = _bitonic_sort_kv(s_ref[:], v_ref[:], C, lane)

    # validity: every sorted node within band*dz of its rank coordinate
    # (single global flag, min-accumulated over the sequential grid)
    maxdisp = jnp.max(jnp.abs(s - z))
    ok_ref[0, 0] = jnp.minimum(ok_ref[0, 0],
                               (maxdisp <= dtype.type(tol)).astype(jnp.int32))

    dv = pltpu.roll(v, (C - 1) % C, 1) - v
    ds = pltpu.roll(s, (C - 1) % C, 1) - s

    v0 = jnp.broadcast_to(v[:, 0:1], v.shape)
    acc = jnp.where(lane < band, v0, pltpu.roll(v, band % C, 1))
    for o in range(-band, band):
        c = lane + o
        valid = (c >= 0) & (c <= C - 2)
        s_o = pltpu.roll(s, (-o) % C, 1)
        ds_o = pltpu.roll(ds, (-o) % C, 1)
        dv_o = pltpu.roll(dv, (-o) % C, 1)
        safe = jnp.where(ds_o > 0.0, ds_o, dtype.type(1.0))
        frac = (z - s_o) / safe
        frac = jnp.where(ds_o > 0.0, frac, (z >= s_o).astype(dtype))
        acc = acc + jnp.where(valid, dv_o * jnp.clip(frac, 0.0, 1.0),
                              dtype.type(0.0))

    inside = (z >= s[:, 0:1]) & (z <= s[:, C - 1:C])
    out_ref[:] = jnp.where(inside, acc, fill_ref[:])


@partial(jax.jit, static_argnames=("band", "tol", "interpret"))
def rsd_sort_interp_pallas(s, v, ztarget, fill, band: int = 4,
                           tol: float = 0.0, interpret: bool = False):
    """Fused sort + banded interp (see module docstring).

    Parameters:
        s: (M, C) UNSORTED node coordinates per LOS, C a power of two.
        v: (M, C) values.
        ztarget: (C,) uniform target grid.
        fill: (M,) hull fill values.
        band: interp half-window in cells.
        tol: validity threshold (band * dz); results are exact iff the
            returned flag is True.

    Returns:
        (out, ok): (M, C) interpolated values and a scalar bool — True
        when every block satisfied the band bound (results exact), False
        when the caller must recompute with the exact fallback.
    """
    M, C = s.shape
    assert C & (C - 1) == 0, f"C={C} must be a power of two"
    dtype = s.dtype
    bm = min(_BLOCK_M, M)
    assert M % bm == 0, f"M={M} must be a multiple of {bm}"
    nblk = M // bm

    out, ok = pl.pallas_call(
        partial(_kernel, C=C, band=band, tol=float(tol)),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, C), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(ztarget.reshape(1, C), s, v, fill.reshape(M, 1))
    return out, ok[0, 0] == 1
