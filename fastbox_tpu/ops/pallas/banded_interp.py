"""Pallas TPU kernel: banded piecewise-linear interpolation for RSD.

Device form of ``ops.rsd._interp_sorted_banded`` (see there for the math):
after the per-LOS sort, every node sits within ``band`` cells of its rank,
so interpolation onto the rank grid needs only the 2*band neighbouring
segments per target,

    out(t) = vv[max(t-band, 0)]
             + sum_{o=-band}^{band-1} dv[t+o] * clamp((z_t - ss[t+o])/ds, 0, 1)

The jnp version materialises ~3 rolled (M, C) arrays per offset in HBM;
here each (BLOCK_M, C) tile is read once into VMEM and all offsets are
lane-rotates on registers — HBM traffic is exactly the inputs plus the
output.  Targets outside the node hull get the per-LOS fill value
(the reference's griddata fill, box.py:429-437).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["banded_interp_pallas"]

_BLOCK_M = 256


def _kernel(z_ref, ss_ref, vv_ref, fill_ref, out_ref, *, C: int, band: int):
    s = ss_ref[:]                        # (BM, C) sorted coordinates
    v = vv_ref[:]                        # (BM, C) values
    z = z_ref[:]                         # (1, C)  rank-grid targets
    dtype = v.dtype

    lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)

    # Segment arrays: dv[c] = v[c+1] - v[c] (last lane is garbage, always
    # masked off by the validity window below)
    dv = pltpu.roll(v, (C - 1) % C, 1) - v
    ds = pltpu.roll(s, (C - 1) % C, 1) - s

    # base(t) = v[max(t - band, 0)]
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


@partial(jax.jit, static_argnames=("band", "interpret"))
def banded_interp_pallas(ss, vv, ztarget, fill, band: int = 4,
                         interpret: bool = False):
    """Banded sorted-interp on the rank grid (see module docstring).

    Parameters:
        ss: (M, C) sorted coordinates, |ss[:, i] - ztarget[i]| <= band*dz.
        vv: (M, C) values sorted with ss.
        ztarget: (C,) uniform target grid.
        fill: (M,) fill outside the per-row hull.

    Returns:
        (M, C) interpolated values, exactly `_interp_sorted_banded` + fill.
    """
    M, C = ss.shape
    dtype = ss.dtype
    bm = min(_BLOCK_M, M)
    assert M % bm == 0, f"M={M} must be a multiple of {bm}"

    return pl.pallas_call(
        partial(_kernel, C=C, band=band),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), dtype),
        interpret=interpret,
    )(ztarget.reshape(1, C), ss, vv, fill.reshape(M, 1))
