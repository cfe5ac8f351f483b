"""Redshift-space distortion remapping.

The reference remaps each line of sight with a Python double loop over the
(x, y) pixel plane calling ``scipy.interpolate.griddata`` per LOS
(box.py:384-438) — its dominant cost at large N (SURVEY.md §6).  On TPU the
remap is a fixed-shape batched computation over all N^2 lines of sight at
once, engineered for the TPU's strengths (measured on v5e):

  * the default TPU path never sorts at all: a fused Pallas kernel finds
    each target's bracket nodes by scanning circularly-rolled lane
    offsets (``pallas/rsd_fused.py``), valid whenever displacements are
    within ``band`` cells (checked; exact fallback otherwise);
  * in the fallback paths the per-LOS sort is one ``lax.sort_key_val``
    along the LOS axis (vs a vmapped argsort+gather, whose XLA lowering
    is pathological);
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
import numpy as np
from jax import lax

from ..grid import GridSpec

__all__ = ["redshift_space_density", "remap_los_batched", "add_scaled_normal"]


# Test hook: when True, Pallas kernels run in interpreter mode on any
# backend so CPU tests can exercise the fused paths end-to-end.
_INTERPRET = False


def _pallas_ok(M: int) -> bool:
    """Use the Pallas interp kernel on TPU-like backends when shapes allow."""
    if M % 128 != 0:
        return False
    if _INTERPRET:
        return True
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


def add_scaled_normal(x, scale_row, key, return_max: bool = False):
    """x + scale_row[..broadcast..] * N(0,1) along the last axis.

    Dispatches to the fused Pallas PRNG kernel on TPU (one read + one
    write of x; the noise never touches HBM), falling back to
    jax.random.normal elsewhere.  ``scale_row`` is a (C,) per-last-axis
    scale; the two streams are statistically identical but not
    bit-identical.  With ``return_max`` also returns ``max|result|``
    (free from per-block maxima on the Pallas path; one extra reduction
    on the fallback) — the RSD remap's displacement bound.
    """
    shape = x.shape
    C = shape[-1]
    R = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    if _pallas_ok(C) and R % 256 == 0:
        from .pallas.noise import add_scaled_normal_pallas

        seed = jax.random.bits(key, (), "uint32").astype(jnp.int32)
        out = add_scaled_normal_pallas(
            x.reshape(R, C), jnp.asarray(scale_row, x.dtype), seed,
            interpret=_INTERPRET, return_max=return_max)
        if return_max:
            return out[0].reshape(shape), out[1]
        return out.reshape(shape)
    y = x + jax.random.normal(key, shape, x.dtype) \
        * jnp.asarray(scale_row, x.dtype)
    if return_max:
        return y, jnp.max(jnp.abs(y))
    return y


def _interp_sorted_banded(ss, vv, ztarget, w: int):
    """Banded telescoping interpolation for nearly-sorted nodes.

    Valid when every sorted node satisfies |ss[:, i] - ztarget[i]| <=
    w * dz (checked by the caller): then segment c is fully crossed for
    c < t - w and untouched for c >= t + w, so

        out(t) = vv[:, max(t-w, 0)]
                 + sum_{c = max(t-w,0)}^{min(t+w-1, C-2)} dv_c clamp_c(t)

    — O(w) work per target instead of O(C), with only static shifts
    (no gathers).  Physically w*dz bounds the RSD displacement
    |v|/H(a): at the default 256^3 / 4 Gpc configuration w=4 admits
    ~6700 km/s, far beyond any peculiar velocity in the box.
    """
    M, C = ss.shape
    dtype = vv.dtype
    dv = vv[:, 1:] - vv[:, :-1]
    ds = ss[:, 1:] - ss[:, :-1]
    # Pad segment arrays to length C so roll() windows stay in range
    dv = jnp.concatenate([dv, jnp.zeros((M, 1), dtype)], axis=1)
    ds = jnp.concatenate([ds, jnp.ones((M, 1), dtype)], axis=1)

    # base(t) = vv[:, max(t - w, 0)]
    base = jnp.concatenate(
        [jnp.broadcast_to(vv[:, :1], (M, w)), vv[:, : C - w]], axis=1)

    t_idx = jnp.arange(C)
    out = base
    for o in range(-w, w):
        c_idx = t_idx + o                        # segment index per target
        valid = (c_idx >= 0) & (c_idx <= C - 2)
        dv_o = jnp.roll(dv, -o, axis=1)
        ds_o = jnp.roll(ds, -o, axis=1)
        ss_o = jnp.roll(ss, -o, axis=1)
        safe_ds = jnp.where(ds_o > 0.0, ds_o, 1.0)
        frac = (ztarget[None, :] - ss_o) / safe_ds
        frac = jnp.where(ds_o > 0.0, frac,
                         (ztarget[None, :] >= ss_o).astype(dtype))
        wgt = jnp.clip(frac, 0.0, 1.0)
        out = out + jnp.where(valid[None, :], dv_o * wgt, 0.0)
    return out


def _interp_full_chunked(ss, vv, ztarget):
    """Exact telescoping interpolation over all segments, chunked over LOS.

    The naive broadcast materialises (M, C-1, T); at 512^3 in f64 that is
    ~550 GiB, which OOMed the CPU truth run (lax.cond allocates the max
    over branches, so even never-executed fallbacks must be bounded).
    ``lax.map`` over row blocks caps the temp at ~1 GiB while computing
    the identical result.
    """
    M, C = ss.shape
    T = int(ztarget.shape[0])
    rows = int(max(1, min(M, (2 ** 27) // max(C * T, 1))))
    pad = (-M) % rows
    ssp = jnp.pad(ss, ((0, pad), (0, 0)))
    vvp = jnp.pad(vv, ((0, pad), (0, 0)))

    def blk(args):
        s_, v_ = args
        dv_ = v_[:, 1:] - v_[:, :-1]
        ds_ = s_[:, 1:] - s_[:, :-1]
        safe = jnp.where(ds_ > 0.0, ds_, 1.0)
        fr = (ztarget[None, None, :] - s_[:, :-1, None]) / safe[:, :, None]
        fr = jnp.where(ds_[:, :, None] > 0.0, fr,
                       (ztarget[None, None, :]
                        >= s_[:, :-1, None]).astype(v_.dtype))
        return v_[:, :1] + jnp.sum(dv_[:, :, None]
                                   * jnp.clip(fr, 0.0, 1.0), axis=1)

    out = lax.map(blk, (ssp.reshape(-1, rows, C), vvp.reshape(-1, rows, C)))
    return out.reshape(-1, T)[:M]


def remap_los_batched(vals, s, ztarget, fill, method: str = "linear",
                      band: int = 4, ztarget_np=None, fused: bool = True,
                      s_unwrapped=None):
    """Scattered 1-D interpolation of many lines of sight at once.

    Uses the *telescoping* form of piecewise-linear interpolation on the
    sorted nodes: with dv_c = v_{c+1}-v_c and ds_c = s_{c+1}-s_c,

        out(t) = v_0 + sum_c dv_c * clamp((z_t - s_c)/ds_c, 0, 1)

    which needs no index computation and no gathers at all — just one fused
    broadcast-reduce over (LOS, segment, target), the access pattern the TPU
    VPU handles at full rate.  (The equivalent searchsorted+gather
    formulation is ~5x slower on v5e even with one-hot-matmul gathers.)
    Targets left of s_0 get v_0, right of s_last get v_last, exactly like
    sorted linear interpolation; the hull fill is applied afterwards.

    Parameters:
        vals: (M, C) sample values per LOS.
        s: (M, C) sample coordinates per LOS (unsorted).
        ztarget: (T,) target grid (shared by all LOS).
        fill: (M,) fill value per LOS (used by 'linear' outside the hull).
        method: 'linear' or 'nearest'.

    Returns:
        (M, T) interpolated values.
    """
    # Banded fast paths: the targets are the (uniform) grid the nodes were
    # displaced from, so when every sorted node lands within `band` cells
    # of its rank the O(C) telescoping sum collapses to O(band).  The bound
    # is checked on device; rare violating realisations (enormous
    # velocities / heavy wrapping) fall back to the exact full kernel via
    # lax.cond.  Concrete, uniform targets of matching length are required
    # to know the rank <-> coordinate correspondence.
    zt_np = None
    if method == "linear" and band > 0:
        import numpy as _np

        if ztarget_np is not None:
            zt_np = _np.asarray(ztarget_np)
        else:
            try:
                # Concrete only outside jit; jitted callers must pass
                # ztarget_np (a dtype cast turns constants into tracers).
                zt_np = _np.asarray(ztarget)
            except Exception:
                zt_np = None
        if zt_np is not None:
            d = _np.diff(zt_np.astype(_np.float64))
            # f32 coordinates carry ~1e-4 jitter in their diffs at Gpc
            # offsets; uniform-enough is all the band bound needs.
            if (zt_np.size != s.shape[1] or d.size == 0
                    or d.min() <= 0
                    or (d.max() - d.min()) > 1e-2 * abs(d.mean())):
                zt_np = None

    M_, C_ = s.shape
    if (fused and method == "linear" and zt_np is not None
            and s_unwrapped is not None and _pallas_ok(M_)
            and C_ & (C_ - 1) == 0 and M_ % min(256, M_) == 0):
        # Fully fused TPU path (default): sort-free periodic bracket
        # interpolation in one kernel — one HBM read of (s, v), one write
        # of the output, no sort at all (see pallas/rsd_fused.py).  Exact
        # whenever every displacement is within `band` cells; that single
        # scalar bound (checked on the unwrapped coordinate) drives the
        # exact fallback.  On v5e: 1.4x / 2.6x faster than the split
        # sort + banded-interp path at 256^3 / 512^3.
        from .pallas.rsd_fused import rsd_bracket_interp_pallas

        dz = float(zt_np[1] - zt_np[0])
        maxdisp = jnp.max(jnp.abs(s_unwrapped - ztarget[None, :]))

        def fast(_):
            return rsd_bracket_interp_pallas(s, vals, ztarget, fill,
                                             band=band,
                                             interpret=_INTERPRET)

        def exact(_):
            from .pallas.rsd_interp import interp_sorted_pallas

            ss_, vv_ = lax.sort_key_val(s, vals)
            return interp_sorted_pallas(ss_, vv_, ztarget, fill,
                                        interpret=_INTERPRET)

        return lax.cond(maxdisp <= band * dz, fast, exact, None)

    ss, vv = lax.sort_key_val(s, vals)

    if method == "linear" and zt_np is not None:
        dz = float(zt_np[1] - zt_np[0])
        maxdisp = jnp.max(jnp.abs(ss - ztarget[None, :]))

        def banded(args):
            ss_, vv_ = args
            C = ss_.shape[1]
            if _pallas_ok(ss_.shape[0]) and C % 128 == 0 \
                    and ss_.shape[0] % min(256, ss_.shape[0]) == 0:
                from .pallas.banded_interp import banded_interp_pallas

                return banded_interp_pallas(ss_, vv_, ztarget, fill, band,
                                            interpret=_INTERPRET)
            return _interp_sorted_banded(ss_, vv_, ztarget, band)

        def full(args):
            ss_, vv_ = args
            if _pallas_ok(ss_.shape[0]):
                from .pallas.rsd_interp import interp_sorted_pallas

                # The kernel applies the hull fill itself; hand it a fill
                # of v_0 / v_last equivalence by re-applying below anyway.
                return interp_sorted_pallas(ss_, vv_, ztarget, fill,
                                            interpret=_INTERPRET)
            return _interp_full_chunked(ss_, vv_, ztarget)

        out = lax.cond(maxdisp <= band * dz, banded, full, (ss, vv))
        inside = ((ztarget[None, :] >= ss[:, :1])
                  & (ztarget[None, :] <= ss[:, -1:]))
        return jnp.where(inside, out, fill[:, None])

    if method == "linear" and _pallas_ok(ss.shape[0]):
        from .pallas.rsd_interp import interp_sorted_pallas

        return interp_sorted_pallas(ss, vv, ztarget, fill,
                                    interpret=_INTERPRET)

    dv = vv[:, 1:] - vv[:, :-1]          # (M, C-1)

    if method == "linear":
        out = _interp_full_chunked(ss, vv, ztarget)
        inside = ((ztarget[None, :] >= ss[:, :1])
                  & (ztarget[None, :] <= ss[:, -1:]))
        return jnp.where(inside, out, fill[:, None])

    if method == "nearest":
        # interp1d 'nearest' (fill_value='extrapolate'): value switches at
        # segment midpoints, searchsorted(mids, z, side='left') semantics
        mids = 0.5 * (ss[:, 1:] + ss[:, :-1])
        step = (mids[:, :, None] < ztarget[None, None, :]).astype(vv.dtype)
        return vv[:, :1] + jnp.sum(dv[:, :, None] * step, axis=1)

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
    vmax = None
    if sigma_nl > 0.0:
        if key is None:
            raise ValueError("sigma_nl > 0 requires a PRNG `key`.")
        vel, vmax = add_scaled_normal(
            vel, jnp.full(N, sigma_nl, rdtype), key, return_max=True)

    fill = 0.5 * (delta_x[..., 0] + delta_x[..., -1])

    # Fully-fused tiered path (TPU default): the wrap, the displacement
    # bound and the bracket interpolation never materialise the (N^3)
    # wrapped-coordinate cube in HBM.  maxdisp = max|v|/Hz comes free
    # from the noise kernel's block maxima; a lax.cond ladder picks the
    # narrowest covering band (band 2 scans 16 lane offsets vs 28 for
    # band 4) with the exact sort-based kernel as the final fallback.
    # Any N lowers since round 5: the bracket kernels take the lane-roll
    # period C directly (_pick_bm clamps block rows to a divisor of M),
    # so non-power-of-two N like 576 rides the fused path instead of
    # falling to the XLA banded rolls whose ~20 (N^2, N) temps HBM-OOM
    # at 576^3 (scripts/maxn_logs/pipeline_576.log).
    if (method == "linear" and _pallas_ok(N * N)
            and (N * N) % min(256, N * N) == 0):
        inv_hz = 1.0 / jnp.asarray(Hz, rdtype)
        maxdisp = (vmax if vmax is not None
                   else jnp.max(jnp.abs(vel))) * inv_hz
        dz = float(grid.z[1] - grid.z[0])
        out = _remap_wrap_tiered(
            delta_x.reshape(N * N, N), vel.reshape(N * N, N), z,
            fill.reshape(N * N), z0, length_z, inv_hz, dz, maxdisp, band=4)
        return out.reshape(N, N, N)

    # Redshift-space coordinate per voxel, periodically wrapped (box.py:422-426)
    u = z[None, None, :] - vel / jnp.asarray(Hz, rdtype)
    s = (u - z0) % length_z + z0

    out = remap_los_batched(
        delta_x.reshape(N * N, N), s.reshape(N * N, N), z,
        fill.reshape(N * N), method=method, ztarget_np=grid.z,
        s_unwrapped=u.reshape(N * N, N),
    )
    return out.reshape(N, N, N)


def _remap_wrap_tiered(vals, vel, ztarget, fill, z0, length_z, inv_hz,
                       dz: float, maxdisp, band: int = 4):
    """Tiered dispatch over the wrap-fused bracket kernel.

    band-2 / band-``band`` kernels under ``lax.cond`` on the runtime
    displacement bound, with the exact sort-based kernel as the final
    fallback (identical semantics to the plain fused path: the kernels
    are exact whenever their band covers ``maxdisp``).
    """
    from .pallas.rsd_fused import rsd_remap_wrap_pallas
    from .pallas.rsd_interp import interp_sorted_pallas

    def tier(b):
        def f(_):
            return rsd_remap_wrap_pallas(vals, vel, ztarget, fill, z0,
                                         length_z, inv_hz, band=b,
                                         interpret=_INTERPRET)
        return f

    def exact(_):
        u = ztarget[None, :] - vel * inv_hz
        s = jnp.mod(u - z0, length_z) + z0
        ss, vv = lax.sort_key_val(s, vals)
        return interp_sorted_pallas(ss, vv, ztarget, fill,
                                    interpret=_INTERPRET)

    def upper(_):
        return lax.cond(maxdisp <= band * dz, tier(band), exact, None)

    if band > 2:
        return lax.cond(maxdisp <= 2 * dz, tier(2), upper, None)
    return upper(None)
