"""Pallas TPU kernel: fused periodic bracket-interpolation for the RSD remap.

One kernel, one HBM read of (s, v) and one write of the output, implementing
the reference RSD remap semantics (box.py:384-438): periodic wrap of the
redshift-space coordinate, scattered 1-D linear regrid onto the original z
grid, hull fill with the LOS-endpoint mean.

Design.  The reference wraps ``s = (z - v/H - z0) mod L + z0`` and sorts
each line of sight before interpolating (scipy griddata).  Sorting is the
expensive part on TPU — a full bitonic network, or an XLA sort whose output
round-trips HBM.  This kernel *never sorts*: linear interpolation at target
t only needs the **bracket pair** — the node with the largest coordinate
<= z_t and the node with the smallest coordinate > z_t.  When every node is
displaced at most ``band`` cells from its own lane (|v|/H <= band*dz — the
caller verifies this single scalar and falls back to the exact path
otherwise), both bracket nodes provably live in an asymmetric lane window
around t *in the circular lane topology*:

  - lane t-band holds a node with coordinate in [z_t - 2*band*dz, z_t],
    so the lower bracket's coordinate is in that interval, putting its
    lane in [t - 3*band, t + band];
  - lane t+band+1 holds a node in (z_t, z_t + (2*band+1)*dz], so the
    upper bracket's lane is in [t - band, t + 3*band + 1];

so a scan over circularly-rolled lane offsets with one-sided compare-select
updates finds the exact brackets.

One wrinkle: the caller wraps coordinates with period ``length_z =
z[-1] - z[0] = (C-1)*dz`` (ops/rsd.py, matching the reference box.py:425),
while ``pltpu.roll`` wraps lanes with period ``C`` — so a node that wraps
across the box face lands one lane skewed relative to the roll topology,
shifting the extreme bracket offsets to -3*band-1 / 3*band+2.  The scan
window is therefore [-3*band-1, 3*band+2] (two rolls wider than the
unwrapped bound needs), which restores exactness for wrapped nodes at the
cost of ~8% more rolls.

Tie-breaking on exactly-equal f32 coordinates follows scan order, which
matches the stable-sort exact paths except when a periodic image is
involved (~1 voxel per 10^7 at f32; the reference's own np.argsort inside
griddata is not stable either, so there is no canonical choice).  ``pltpu.roll`` wraps
lanes around, which is precisely the periodic-image behaviour of the
reference's coordinate wrap — boundary cells that wrap to the far box face
are found through the rolled-around window with their wrapped coordinates.

The hull fill (griddata returns ``fill`` outside [min s, max s],
box.py:429-437) falls out of per-row min/max reductions.

Compared with sort-based designs this is seam-free (no ghost images, no
monotonicity proofs) and all offsets are data-independent lane rotates.
On v5e it beats the split XLA-sort + banded-interp path by ~1.4x at 256^3
and ~2.6x at 512^3.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rsd_bracket_interp_pallas", "rsd_remap_wrap_pallas"]

_BLOCK_M = 256


def _pick_bm(M: int, C: int) -> int:
    """Block rows: the working-set target (≈ _BLOCK_M rows at C=256),
    clamped to a DIVISOR of M — preferring sublane multiples of 8 — so
    any (M, C) pair lowers (non-power-of-two C like 576 gives targets
    such as 113 that no power-of-two M divides)."""
    target = min(_BLOCK_M, M, max(8, (_BLOCK_M * 256) // C))
    for bm in range(target, 7, -1):
        if M % bm == 0 and bm % 8 == 0:
            return bm
    for bm in range(min(target, M), 0, -1):
        if M % bm == 0:
            return bm
    return 1


def _bracket_interp(z, s, v, fill, *, C: int, band: int):
    """Shared kernel body: bracket scan + interp + hull fill.

    z (1, C) targets; s (bm, C) wrapped node coords; v (bm, C) values;
    fill (bm, 1).  Returns the (bm, C) interpolated block.
    """
    dtype = v.dtype
    BIG = dtype.type(jnp.finfo(dtype).max / 4)

    s_lo = jnp.full(s.shape, -BIG, dtype)
    v_lo = jnp.zeros(s.shape, dtype)
    s_hi = jnp.full(s.shape, BIG, dtype)
    v_hi = jnp.zeros(s.shape, dtype)

    # Asymmetric windows (proof in module docstring): the lower bracket's
    # lane offset lies in [-3*band-1, band], the upper's in [-band,
    # 3*band+2] — each extreme widened by one lane for the (C-1)*dz wrap
    # skew relative to the C-periodic roll topology.
    for o in range(-3 * band - 1, 3 * band + 3):
        sc = pltpu.roll(s, (C - o) % C, 1)    # node coord at lane t + o
        vc = pltpu.roll(v, (C - o) % C, 1)
        below = sc <= z
        if o <= band:
            # >= : on duplicate coordinates the later-scanned node wins,
            # matching the stable-sort + telescoping step semantics of
            # the exact paths (value switches at the LAST duplicate).
            up_lo = below & (sc >= s_lo)
            s_lo = jnp.where(up_lo, sc, s_lo)
            v_lo = jnp.where(up_lo, vc, v_lo)
        if o >= -band:
            # < : the upper bracket keeps the FIRST duplicate, ditto.
            up_hi = (~below) & (sc < s_hi)
            s_hi = jnp.where(up_hi, sc, s_hi)
            v_hi = jnp.where(up_hi, vc, v_hi)

    # Linear interp between the brackets.  At z == s_lo (incl. the hull
    # maximum, where s_hi stays at the sentinel) frac == 0 -> v_lo.
    frac = (z - s_lo) / (s_hi - s_lo)
    out = v_lo + (v_hi - v_lo) * frac

    # griddata hull: fill outside [min s, max s] (box.py:429-437)
    smin = jnp.min(s, axis=1, keepdims=True)
    smax = jnp.max(s, axis=1, keepdims=True)
    inside = (z >= smin) & (z <= smax)
    return jnp.where(inside, out, fill)


def _kernel(z_ref, s_ref, v_ref, fill_ref, out_ref, *, C: int, band: int):
    out_ref[:] = _bracket_interp(z_ref[:], s_ref[:], v_ref[:], fill_ref[:],
                                 C=C, band=band)


def _kernel_wrap(wrap_ref, z_ref, vel_ref, v_ref, fill_ref, out_ref, *,
                 C: int, band: int):
    """Variant computing the wrapped redshift-space coordinate in-tile.

    ``vel_ref`` is the raw LOS velocity (km/s); ``wrap_ref`` is a
    scalar-prefetched (3,) row (z0, length_z, 1/Hz).  Computing
    ``s = (z - v/Hz - z0) mod L + z0`` here saves the HBM write + read
    of the (M, C) wrapped-coordinate cube the plain kernel consumes
    (~4 ms at 512^3).
    """
    z = z_ref[:]
    z0 = wrap_ref[0]
    length = wrap_ref[1]
    inv_hz = wrap_ref[2]
    u = z - vel_ref[:] * inv_hz
    s = jnp.mod(u - z0, length) + z0
    out_ref[:] = _bracket_interp(z, s, v_ref[:], fill_ref[:], C=C, band=band)


@partial(jax.jit, static_argnames=("band", "interpret"))
def rsd_bracket_interp_pallas(s, v, ztarget, fill, band: int = 4,
                              interpret: bool = False):
    """Fused periodic bracket interpolation (see module docstring).

    Parameters:
        s: (M, C) WRAPPED node coordinates per LOS (the reference's
            ``(z - v/H - z0) mod L + z0``).  Any C lowers (the lane
            rolls take period C directly); non-128-multiple C pads the
            lane tile internally (576 -> 640, ~11%% extra VPU work).
        v: (M, C) values.
        ztarget: (C,) uniform target grid.
        fill: (M,) hull fill values.
        band: displacement bound in cells.  Results are exact iff every
            node satisfies |v|/H <= band * dz — the CALLER must verify
            this (one scalar reduction of the velocity field) and fall
            back to the exact path otherwise.

    Returns:
        (M, C) interpolated values.
    """
    M, C = s.shape
    dtype = s.dtype
    # Block rows scaled so the kernel's working set (input, brackets and
    # rolled temporaries) fits the 16 MB scoped-VMEM budget.
    bm = _pick_bm(M, C)
    nblk = M // bm

    return pl.pallas_call(
        partial(_kernel, C=C, band=band),
        grid=(nblk,),
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
    )(ztarget.reshape(1, C), s, v, fill.reshape(M, 1))


@partial(jax.jit, static_argnames=("band", "interpret"))
def rsd_remap_wrap_pallas(vals, vel, ztarget, fill, z0, length_z, inv_hz,
                          band: int = 4, interpret: bool = False):
    """Wrap-fused variant: computes s = (z - v/Hz - z0) mod L + z0 in-tile.

    Parameters:
        vals: (M, C) values to remap (the density field rows).
        vel: (M, C) LOS velocity (km/s), noise already applied.
        ztarget: (C,) uniform target grid.
        fill: (M,) hull fill values.
        z0, length_z, inv_hz: wrap origin, wrap period (z[-1]-z[0],
            matching the reference box.py:425) and 1/H(a) — traced
            scalars, delivered to SMEM via scalar prefetch.
        band: displacement bound in cells (caller must verify
            max|v|/Hz <= band*dz, exactly as for the plain kernel).

    Returns:
        (M, C) remapped values.
    """
    M, C = vals.shape
    dtype = vals.dtype
    bm = _pick_bm(M, C)
    nblk = M // bm

    wrap = jnp.stack([jnp.asarray(z0, dtype), jnp.asarray(length_z, dtype),
                      jnp.asarray(inv_hz, dtype)])
    dspec = pl.BlockSpec((bm, C), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel_wrap, C=C, band=band),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((1, C), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                dspec,
                dspec,
                pl.BlockSpec((bm, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=dspec,
        ),
        out_shape=jax.ShapeDtypeStruct((M, C), dtype),
        interpret=interpret,
    )(wrap, ztarget.reshape(1, C), vel, vals, fill.reshape(M, 1))
