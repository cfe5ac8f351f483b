"""Redshift-space distortion remapping.

The reference remaps each line of sight with a Python double loop over the
(x, y) pixel plane calling ``scipy.interpolate.griddata`` per LOS
(box.py:384-438) — its dominant cost at large N (SURVEY.md §6).  On TPU the
remap is a fixed-shape batched computation over all N^2 lines of sight at
once, engineered for the TPU's strengths (measured on v5e):

  * the per-LOS sort is one ``lax.sort_key_val`` along the LOS axis
    (vs a vmapped argsort+gather, whose XLA lowering is pathological);
  * insertion indices come from a comparison-sum
    ``sum(s_sorted <= z_target)`` — a fused VPU reduction ~170x faster
    than vmapped ``searchsorted`` on TPU;
  * the neighbour gathers are one-hot matmul contractions on the MXU,
    ~14x faster than ``take_along_axis``.

Semantics matched to the reference:
  * ``s = z - (v_z + v_nl) / H(a)`` (box.py:422)
  * periodic wrap ``s -> (s - z0) mod Lz + z0`` (box.py:425-426)
  * 1-D ``griddata`` linear: targets outside [min(s), max(s)] get the fill
    value ``0.5 (delta[...,0] + delta[...,-1])`` (box.py:429-437)
  * ``method='nearest'``: scipy dispatches to
    interp1d(kind='nearest', fill_value='extrapolate') — nearest endpoint
    out of range, midpoint bisection inside.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..grid import GridSpec

__all__ = ["redshift_space_density", "remap_los_batched"]


def _onehot_gather(values, idx, depth):
    """values (M, C), idx (M, T) -> values[m, idx[m, t]] via MXU matmul."""
    oh = jax.nn.one_hot(idx, depth, dtype=values.dtype)  # (M, T, C)
    return jnp.einsum("mc,mtc->mt", values, oh)


def remap_los_batched(vals, s, ztarget, fill, method: str = "linear"):
    """Scattered 1-D interpolation of many lines of sight at once.

    Parameters:
        vals: (M, C) sample values per LOS.
        s: (M, C) sample coordinates per LOS (unsorted).
        ztarget: (C,) target grid (shared by all LOS).
        fill: (M,) fill value per LOS (used by 'linear' outside the hull).
        method: 'linear' or 'nearest'.

    Returns:
        (M, C) interpolated values.
    """
    C = s.shape[-1]
    ss, vv = lax.sort_key_val(s, vals)

    if method == "linear":
        # idx = searchsorted(ss, z, side='right'), clipped to [1, C-1]
        idx = jnp.sum((ss[:, :, None] <= ztarget[None, None, :]),
                      axis=1, dtype=jnp.int32)
        idx = jnp.clip(idx, 1, C - 1)
        lo = _onehot_gather(ss, idx - 1, C)
        hi = _onehot_gather(ss, idx, C)
        vlo = _onehot_gather(vv, idx - 1, C)
        vhi = _onehot_gather(vv, idx, C)
        denom = jnp.where(hi > lo, hi - lo, 1.0)
        w = (ztarget[None, :] - lo) / denom
        out = vlo * (1.0 - w) + vhi * w
        inside = ((ztarget[None, :] >= ss[:, :1])
                  & (ztarget[None, :] <= ss[:, -1:]))
        return jnp.where(inside, out, fill[:, None])

    if method == "nearest":
        mids = 0.5 * (ss[:, 1:] + ss[:, :-1])
        # interp1d 'nearest' uses searchsorted(mids, z, side='left')
        idx = jnp.sum((mids[:, :, None] < ztarget[None, None, :]),
                      axis=1, dtype=jnp.int32)
        return _onehot_gather(vv, idx, C)

    raise ValueError(f"Unsupported RSD interpolation method '{method}'")


@partial(jax.jit, static_argnames=("grid", "sigma_nl", "method"))
def redshift_space_density(
    delta_x,
    velocity_z,
    grid: GridSpec,
    Hz: float,
    sigma_nl: float = 0.0,
    key=None,
    method: str = "linear",
):
    """Remap a real-space density cube to redshift space (box.py:384-438).

    Parameters:
        delta_x: (N,N,N) real-space density field.
        velocity_z: (N,N,N) LOS (z-axis) velocity in km/s.
        grid: static geometry.
        Hz: H(a) in km/s/Mpc (the reference computes ``100 h E(a)`` at
            box.py:406).
        sigma_nl: RMS of incoherent small-scale velocities (km/s).  When > 0
            a ``key`` must be supplied for the random draw (box.py:416-418).
        key: jax PRNG key for the sigma_nl draw.
        method: 'linear' or 'nearest'.

    Returns:
        delta_s: (N,N,N) redshift-space density field.
    """
    rdtype = delta_x.dtype
    N = grid.N
    z = jnp.asarray(grid.z, dtype=rdtype)
    z0 = z[0]
    length_z = z[-1] - z[0]

    vel = velocity_z
    if sigma_nl > 0.0:
        if key is None:
            raise ValueError("sigma_nl > 0 requires a PRNG `key`.")
        vel = vel + sigma_nl * jax.random.normal(key, delta_x.shape, dtype=rdtype)

    # Redshift-space coordinate per voxel, periodically wrapped (box.py:422-426)
    s = z[None, None, :] - vel / jnp.asarray(Hz, rdtype)
    s = (s - z0) % length_z + z0

    fill = 0.5 * (delta_x[..., 0] + delta_x[..., -1])

    out = remap_los_batched(
        delta_x.reshape(N * N, N), s.reshape(N * N, N), z,
        fill.reshape(N * N), method=method,
    )
    return out.reshape(N, N, N)
