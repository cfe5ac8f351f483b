"""Pallas TPU kernel: batched per-LOS piecewise-linear interpolation.

The RSD remap's hot loop (ops/rsd.py): after sorting, each line of sight
needs out(t) = v_0 + sum_c dv_c * clamp((z_t - s_c)/ds_c, 0, 1) over C-1
segments.  The XLA broadcast-reduce materialises (M, C, T) intermediates;
this kernel keeps a (T, BLOCK_M) accumulator in VMEM and streams the
segment loop on the VPU, so HBM traffic is just the sorted inputs and the
output.

Layout note: arrays are processed transposed — LOS index on the lane
dimension, segment index on sublanes — because Mosaic supports dynamic ref
slicing on sublane dimensions (the segment loop index is traced).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["interp_sorted_pallas"]

_BLOCK_M = 128  # lanes


def _kernel(z_ref, ss_ref, vv_ref, fill_ref, out_ref, *, C: int):
    z = z_ref[:]                         # (T, 1)
    bm = ss_ref.shape[1]

    acc = jnp.broadcast_to(vv_ref[0:1, :], (z.shape[0], bm))

    def body(c, acc):
        s_lo = ss_ref[pl.ds(c, 1), :]    # (1, BM)
        s_hi = ss_ref[pl.ds(c + 1, 1), :]
        v_lo = vv_ref[pl.ds(c, 1), :]
        v_hi = vv_ref[pl.ds(c + 1, 1), :]
        dv = v_hi - v_lo
        ds = s_hi - s_lo
        safe = jnp.where(ds > 0.0, ds, 1.0)
        frac = (z - s_lo) / safe
        frac = jnp.where(ds > 0.0, frac, (z >= s_lo).astype(acc.dtype))
        return acc + dv * jnp.clip(frac, 0.0, 1.0)

    acc = jax.lax.fori_loop(0, C - 1, body, acc)

    inside = (z >= ss_ref[0:1, :]) & (z <= ss_ref[C - 1:C, :])
    out_ref[:] = jnp.where(inside, acc, fill_ref[:])


@partial(jax.jit, static_argnames=("interpret",))
def interp_sorted_pallas(ss, vv, ztarget, fill, interpret: bool = False):
    """Piecewise-linear interp of sorted per-row samples at shared targets.

    Parameters:
        ss: (M, C) sorted sample coordinates per row.
        vv: (M, C) sample values (sorted with ss).
        ztarget: (T,) target coordinates.
        fill: (M,) value outside [ss[:,0], ss[:,-1]].

    Returns:
        (M, T) interpolated values; semantics identical to
        ops.rsd.remap_los_batched(method='linear') on pre-sorted input.
    """
    M, C = ss.shape
    T = ztarget.shape[0]
    bm = min(_BLOCK_M, M)
    assert M % bm == 0, f"M={M} must be a multiple of {bm}"
    dtype = ss.dtype

    out_t = pl.pallas_call(
        partial(_kernel, C=C),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, bm), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, M), dtype),
        interpret=interpret,
    )(ztarget.reshape(T, 1), ss.T, vv.T, fill.reshape(1, M))
    return out_t.T
