"""Datacube utilities (reference fastbox/analysis.py).

NaN handling, grid-to-grid interpolation, and catalogue gridding — all as
fixed-shape device ops (the reference loops channels in Python and uses
scipy interpolators, analysis.py:5-118).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "replace_nan_with_channel_mean",
    "interpolate_onto_grid",
    "grid_catalogue",
]


def replace_nan_with_channel_mean(field):
    """Replace NaNs with each channel's non-NaN mean (analysis.py:5-28)."""
    shape = field.shape
    d = field.reshape((-1, shape[-1]))
    good = ~jnp.isnan(d)
    avg = jnp.where(good, d, 0.0).sum(axis=0) / good.sum(axis=0)
    return jnp.where(good, d, avg[None, :]).reshape(shape)


def _interp1d_weights(xs, xt):
    """Indices/weights for linear interp from grid xs to targets xt.

    Out-of-range targets get NaN (matching RegularGridInterpolator with
    bounds_error=False, fill_value=nan).
    """
    xs = jnp.asarray(xs)
    xt = jnp.asarray(xt)
    n = xs.shape[0]
    idx = jnp.clip(jnp.searchsorted(xs, xt, side="right"), 1, n - 1)
    lo, hi = xs[idx - 1], xs[idx]
    w = (xt - lo) / jnp.where(hi > lo, hi - lo, 1.0)
    inside = (xt >= xs[0]) & (xt <= xs[-1])
    return idx, w, inside


def interpolate_onto_grid(field, coords_orig, coords_new):
    """Trilinear regrid of a 3D field (analysis.py:31-70).

    Coordinates must be ascending.  NaNs in the input are replaced with the
    channel mean first; out-of-range output voxels are NaN.
    """
    field = replace_nan_with_channel_mean(jnp.asarray(field))
    out = field
    mask = None
    for axis, (xs, xt) in enumerate(zip(coords_orig, coords_new)):
        idx, w, inside = _interp1d_weights(xs, xt)
        lo = jnp.take(out, idx - 1, axis=axis)
        hi = jnp.take(out, idx, axis=axis)
        shape = [1, 1, 1]
        shape[axis] = -1
        wb = w.reshape(shape)
        out = lo * (1.0 - wb) + hi * wb
        m = inside.reshape(shape)
        mask = m if mask is None else mask & m
    return jnp.where(mask, out, jnp.nan)


def grid_catalogue(x, y, z, w=None, xlim=None, ylim=None, zlim=None,
                   nx=None, ny=None, nz=None):
    """Bin a 3D catalogue onto a regular grid (analysis.py:73-118).

    Matches ``np.histogramdd`` semantics: nx equal-width bins over
    [min, max], right-inclusive final edge.  Returns (grid, (xg, yg, zg))
    with xg/yg/zg the linspace "bin centre" arrays the reference returns.
    """
    assert nx is not None and ny is not None and nz is not None, \
        "nx, ny, and nz must be specified."
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    z = jnp.asarray(z)

    lims = []
    for arr, lim in ((x, xlim), (y, ylim), (z, zlim)):
        if lim is None:
            lim = (jnp.min(arr), jnp.max(arr))
        lims.append(lim)
    (xmin, xmax), (ymin, ymax), (zmin, zmax) = lims

    def digitize(arr, lo, hi, n):
        t = (arr - lo) / (hi - lo) * n
        i = jnp.floor(t).astype(jnp.int32)
        i = jnp.where(arr == hi, n - 1, i)  # top edge inclusive
        valid = (arr >= lo) & (arr <= hi)
        return i, valid

    ix, vx = digitize(x, xmin, xmax, nx)
    iy, vy = digitize(y, ymin, ymax, ny)
    iz, vz = digitize(z, zmin, zmax, nz)
    valid = vx & vy & vz
    flat = (ix * ny + iy) * nz + iz
    flat = jnp.where(valid, flat, nx * ny * nz)

    weights = jnp.ones_like(x) if w is None else jnp.asarray(w)
    grid = jnp.zeros(nx * ny * nz + 1, dtype=weights.dtype)
    grid = grid.at[flat].add(weights)
    grid = grid[:-1].reshape(nx, ny, nz)

    xg = np.linspace(float(xmin), float(xmax), nx)
    yg = np.linspace(float(ymin), float(ymax), ny)
    zg = np.linspace(float(zmin), float(zmax), nz)
    return grid, (xg, yg, zg)
