"""Pallas TPU kernel: fused factored (Cooley-Tukey) C2C DFT along a
leading axis of a rank-3 array.

Why.  The matmul DFTs in ``ops/mmfft.py`` run each axis as one dense
(C, C) einsum: robust, but the MXU pays the full C MACs per output
element, and at HIGHEST precision (6-pass bf16 emulation) the three
512^3 cube transforms cost ~66 ms of a 135 ms pipeline.  A factored
C = n1 * n2 DFT does n1-butterflies (pure VPU adds) + a twiddle + an
(n2, n2) matmul — n2/C of the dense flops — but in XLA the inter-stage
reshape/transpose relayouts eat the gain (measured 2.2x SLOWER at 512^3,
scripts/tpu_campaign.log followup7).  Here both stages run inside one
Pallas kernel on a (C, LB) VMEM tile: the butterflies are sublane-block
adds, the twiddle is a resident (C, 1) broadcast multiply, the matmul
contracts n2 = 128 (a fully-loaded systolic array), and the only HBM
traffic is one read + one write of the cube.  Measured at 512^3 scale
(scripts/probe_mosaic_dft.py): 4.8 ms/axis vs 8.1 ms for the shipping
dense einsum, at the same f32 accuracy class (1.4e-07).

Math (decimation in time).  With j = j1*n2 + j2, k = k1 + n1*k2:

    A[k1, j2]     = sum_j1 x[j1*n2 + j2] W_n1^(s j1 k1)   (butterflies)
    B[k1, j2]     = A[k1, j2] * W_C^(s k1 j2)             (twiddle)
    X[k1 + n1 k2] = sum_j2 B[k1, j2] W_n2^(s j2 k2)       (MXU matmul)

The kernel computes a whole length-C line per tile with the transform
axis on sublanes, so axis-0 and axis-1 transforms of an (A, B, H) array
need no transposes at all — the BlockSpec picks (C, 1, LB) or (1, C, LB)
tiles and lanes stream the untransformed minor axis.

Complex data travels as separate (re, im) float32 planes — the callers
(mmfft.rfftn3/irfftn3) already hold the half-spectrum as real pairs at
the R2C/C2R boundary stages, so no extra complex<->planar conversion is
paid on the forward path and one jnp.real/imag split on the inverse.

Reference semantics: numpy.fft.fft/ifft along the axis (ifft folds its
1/C into the stage-2 matrix); validated against numpy in
tests/test_pallas_dft.py and end-to-end through the pipeline oracles.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dft_c2c_axis_pallas", "supported_length"]

_LB = 128  # lane-block width (minor-axis elements per tile)


def supported_length(C: int) -> bool:
    """Lengths the factored kernel handles: n1 in {2, 4} with n2 a
    lane-aligned dense stage (n2 % 128 == 0, n2 <= 512)."""
    return _split(C) is not None


def axis0_supported(C: int) -> bool:
    """Axis-0 tiles must carry 8 middle rows (Mosaic block rule), so the
    working set is 8x an axis-1 tile — within the ~16 MB VMEM budget only
    up to C = 256.  Larger axis-0 transforms use the caller's planar
    dense-einsum fallback."""
    return supported_length(C) and C <= 256


def _split(C: int):
    for n1 in (4, 2):
        n2, rem = divmod(C, n1)
        if rem == 0 and n2 % 128 == 0 and 128 <= n2 <= 512:
            return n1, n2
    return None


@lru_cache(maxsize=32)
def _consts(C: int, sign: int, inverse_scale: bool):
    """Host-side stage constants: ((n1, n2), W2 re/im, twiddle re/im).

    numpy float64 throughout; the 1/C inverse normalisation is folded
    into W2 so the butterflies and twiddle stay unit-magnitude.
    """
    n1, n2 = _split(C)
    k = np.arange(n2)
    W2 = np.exp(sign * 2j * np.pi * np.outer(k, k) / n2)
    if inverse_scale:
        W2 = W2 / C
    T = np.exp(sign * 2j * np.pi
               * (np.repeat(np.arange(n1), n2) * np.tile(k, n1)) / C)
    f32 = np.float32
    return ((n1, n2),
            W2.real.astype(f32), W2.imag.astype(f32),
            T.real.astype(f32).reshape(C, 1),
            T.imag.astype(f32).reshape(C, 1))


def _butterfly(xs_r, xs_i, sign: int):
    """Radix-n1 DFT over the j1 sublane blocks (n1 in {2, 4})."""
    n1 = len(xs_r)
    if n1 == 2:
        return ([xs_r[0] + xs_r[1], xs_r[0] - xs_r[1]],
                [xs_i[0] + xs_i[1], xs_i[0] - xs_i[1]])
    # radix-4: A_k1 = sum_j1 x_j1 W_4^(s j1 k1), W_4^s = s * (-i)
    t0r, t0i = xs_r[0] + xs_r[2], xs_i[0] + xs_i[2]
    t1r, t1i = xs_r[0] - xs_r[2], xs_i[0] - xs_i[2]
    u0r, u0i = xs_r[1] + xs_r[3], xs_i[1] + xs_i[3]
    u1r, u1i = xs_r[1] - xs_r[3], xs_i[1] - xs_i[3]
    if sign < 0:        # forward: A1 = t1 - i u1, A3 = t1 + i u1
        ar = [t0r + u0r, t1r + u1i, t0r - u0r, t1r - u1i]
        ai = [t0i + u0i, t1i - u1r, t0i - u0i, t1i + u1r]
    else:               # inverse: conjugated mixing
        ar = [t0r + u0r, t1r - u1i, t0r - u0r, t1r + u1i]
        ai = [t0i + u0i, t1i + u1r, t0i - u0i, t1i - u1r]
    return ar, ai


def _stages(xr, xi, tr_full, ti_full, w2r, w2i, *, n1, n2, sign, precision):
    """Butterflies + twiddle + stage-2 dots on a (C, ...) tile.

    ``xr``/``xi`` may be rank 2 (C, L) or rank 3 (C, T, L) — the
    butterflies slice dim 0 and the stage-2 contraction runs over dim 0
    via dot_general, so trailing dims ride along unchanged.
    """
    C = n1 * n2
    xs_r = [xr[k * n2:(k + 1) * n2] for k in range(n1)]
    xs_i = [xi[k * n2:(k + 1) * n2] for k in range(n1)]
    ar, ai = _butterfly(xs_r, xs_i, sign)

    nd = ((( 1,), (0,)), ((), ()))
    dot = partial(jax.lax.dot_general, dimension_numbers=nd,
                  precision=precision, preferred_element_type=jnp.float32)
    extra = (1,) * (xr.ndim - 2)
    outs_r, outs_i = [], []
    for k1 in range(n1):
        tr = tr_full[k1 * n2:(k1 + 1) * n2].reshape((n2,) + extra + (1,))
        ti = ti_full[k1 * n2:(k1 + 1) * n2].reshape((n2,) + extra + (1,))
        br = ar[k1] * tr - ai[k1] * ti
        bi = ar[k1] * ti + ai[k1] * tr
        outs_r.append(dot(w2r, br) - dot(w2i, bi))
        outs_i.append(dot(w2r, bi) + dot(w2i, br))
    # interleave: out[k1 + n1*k2] = Y_k1[k2]  (k2-major stack)
    yr = jnp.stack(outs_r, axis=1).reshape((C,) + xr.shape[1:])
    yi = jnp.stack(outs_i, axis=1).reshape((C,) + xr.shape[1:])
    return yr, yi


def _kernel_ax1(w2r_ref, w2i_ref, tr_ref, ti_ref, xr_ref, xi_ref,
                yr_ref, yi_ref, *, n1: int, n2: int, sign: int, precision):
    yr, yi = _stages(xr_ref[0], xi_ref[0], tr_ref[:], ti_ref[:],
                     w2r_ref[:], w2i_ref[:], n1=n1, n2=n2, sign=sign,
                     precision=precision)
    yr_ref[0] = yr
    yi_ref[0] = yi


def _kernel_ax0(w2r_ref, w2i_ref, tr_ref, ti_ref, xr_ref, xi_ref,
                yr_ref, yi_ref, *, n1: int, n2: int, sign: int, precision):
    # Block (C, 8, LB): the Mosaic lowering requires the last two block
    # dims be (multiple of 8, multiple of 128), so the axis-0 tile carries
    # 8 middle rows; the stage-2 dot_general contracts dim 0 with the
    # trailing (8, LB) dims riding along.
    yr, yi = _stages(xr_ref[:], xi_ref[:], tr_ref[:], ti_ref[:],
                     w2r_ref[:], w2i_ref[:], n1=n1, n2=n2, sign=sign,
                     precision=precision)
    yr_ref[:] = yr
    yi_ref[:] = yi


@partial(jax.jit,
         static_argnames=("axis", "sign", "inverse_scale", "precision",
                          "interpret"))
def dft_c2c_axis_pallas(xr, xi, axis: int, sign: int,
                        inverse_scale: bool = False,
                        precision=jax.lax.Precision.HIGHEST,
                        interpret: bool = False):
    """C2C DFT along ``axis`` (0 or 1) of a rank-3 float32 pair.

    Parameters:
        xr, xi: (A, B, M) real/imaginary planes, float32.
        axis: transformed axis, 0 or 1; its length must satisfy
            :func:`supported_length`.
        sign: -1 forward (numpy fft), +1 inverse (numpy ifft with
            ``inverse_scale=True`` for the 1/C normalisation).
        precision: MXU precision for the stage-2 matmuls (HIGHEST keeps
            ~f32 accuracy, measured 1.4e-07 at C=512).

    Returns:
        (yr, yi), same shapes.
    """
    assert axis in (0, 1), axis
    A, B, M = xr.shape
    assert xi.shape == xr.shape
    C = xr.shape[axis]
    (n1, n2), w2r, w2i, tr, ti = _consts(C, sign, inverse_scale)

    nlb = pl.cdiv(M, _LB)
    if axis == 0:
        # Middle block dim must be a multiple of 8 (Mosaic tiling rule).
        bt = 8
        while B % bt != 0:
            bt //= 2
        if bt < 8 and B >= 8:
            bt = B  # odd middle dims: take the whole axis per tile
        grid = (B // bt, nlb)
        dspec = pl.BlockSpec((C, bt, _LB), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM)
        kern = _kernel_ax0
    else:
        grid = (A, nlb)
        dspec = pl.BlockSpec((1, C, _LB), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
        kern = _kernel_ax1
    cspec = [
        pl.BlockSpec((n2, n2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n2, n2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]

    yr, yi = pl.pallas_call(
        partial(kern, n1=n1, n2=n2, sign=sign, precision=precision),
        grid=grid,
        in_specs=cspec + [dspec, dspec],
        out_specs=[dspec, dspec],
        out_shape=[jax.ShapeDtypeStruct(xr.shape, jnp.float32)] * 2,
        interpret=interpret,
    )(jnp.asarray(w2r), jnp.asarray(w2i), jnp.asarray(tr), jnp.asarray(ti),
      xr, xi)
    return yr, yi
