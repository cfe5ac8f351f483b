"""Pallas TPU kernel: fused colored Hermitian half-spectrum draw.

The pipeline's density realisation (reference box.py:130-194) draws
complex white noise on the rfft half-spectrum and colours it by
``amp = sqrt(P(k) boxfactor)``:

    delta_k = (n1 + i n2) * sqrt(0.5) * amp          (interior kz modes)

The stock path (fields/gaussian.hermitian_half_noise) burns three HBM
round trips: threefry bit generation, erfinv conversion for each of the
two normal fields, and the separate colour multiply.  Here the on-core
PRNG (pltpu.prng_random_bits) generates the bits in VMEM, one Box-Muller
transform yields BOTH independent normal fields (cos and sin branches),
and the colour multiply is fused — HBM traffic is one read of ``amp``
plus one write each of Re/Im.

The kz=0 plane (and the kz=N/2 plane for even N) needs an internal 2D
Hermitian pairing that a row-local kernel cannot express; callers
overwrite those two (N, N) planes afterwards (fields/gaussian
.colored_half_noise), an O(N^2) correction on an O(N^3) draw.

Stream caveat: the normals are exact N(0,1) (Box-Muller on 24-bit
uniforms, the construction validated on hardware by
scripts/tpu_kernel_checks.py) but the stream differs from
jax.random.normal — the realisation CHANGES relative to the threefry
path.  Statistics are identical; per-bin reproducibility against
threefry is not.  The pipeline therefore gates this behind
``PipelineConfig.pallas_draw`` and forces the threefry path whenever
``threefry_noise=True`` (the truth-gate configuration).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .noise import _box_muller

__all__ = ["colored_complex_normal_pallas",
           "colored_complex_normal_vz_pallas"]

_SQRT_HALF = 0.7071067811865476
# Per-buffer VMEM block cap: tighter than binned_pk.py's 2.5 MB because
# Box-Muller materialises several elementwise temps (bits, uniforms,
# radius, angle, cos, sin) alongside the three io blocks.
_MAX_BLOCK_BYTES = 1.3e6


def _kernel(seed_ref, amp_ref, re_ref, im_ref):
    # Mosaic caps prng_seed at 2 values: spend them as (key word 0,
    # key word 1 ^ block index) — 64 bits of the jax key survive (a
    # single 32-bit word collides distinct ensemble keys at birthday
    # rates over ~10^5 realisations), and each row-block still gets a
    # distinct stream because blk only touches the second word.
    blk = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ blk)
    amp = amp_ref[:]                      # (BR, BC)
    dtype = jnp.dtype(amp.dtype)
    # One Box-Muller pass yields two INDEPENDENT unit normal fields: the
    # cos branch colours the real part, the sin branch the imaginary.
    n_re, n_im = _box_muller(amp.shape, dtype)
    s = amp * dtype.type(_SQRT_HALF)
    re_ref[:] = s * n_re
    im_ref[:] = s * n_im


def _kernel_vz(seed_ref, amp_ref, kx2_ref, kyz2_ref, kznum_ref,
               re_ref, im_ref, vre_ref, vim_ref):
    """Draw + colour + velocity k-weighting in one VMEM pass.

    Round-4 fusion experiment (VERDICT #7): the previous draw-only kernel
    lost in composition partly because XLA fuses erfinv+colour+the vz
    weighting into one HBM pass that the kernel boundary then splits.
    Emitting vz_k = delta_k * (i * vel_fac * kz / k^2) here removes that
    split: the weight is built from three tiny vectors (kx^2 per row,
    ky^2+kz^2 and vel_fac*kz per lane), and the kz=0 / Nyquist planes
    need NO Hermitian fix-up — their weight is identically zero, so the
    delta-plane overwrites don't touch vz.
    """
    blk = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ blk)
    amp = amp_ref[:]                      # (BR, BC)
    dtype = jnp.dtype(amp.dtype)
    n_re, n_im = _box_muller(amp.shape, dtype)
    s = amp * dtype.type(_SQRT_HALF)
    re = s * n_re
    im = s * n_im
    re_ref[:] = re
    im_ref[:] = im
    k2 = kx2_ref[:] + kyz2_ref[:]         # (BR,1) + (1,BC)
    w = jnp.where(k2 > 0.0, kznum_ref[:] / jnp.where(k2 > 0.0, k2, 1.0), 0.0)
    vre_ref[:] = -im * w                  # (re + i im) * (i w)
    vim_ref[:] = re * w


@partial(jax.jit, static_argnames=("interpret",))
def colored_complex_normal_vz_pallas(amp2d, kx2col, kyz2row, kznumrow, seed,
                                     interpret: bool = False):
    """(Re, Im, vzRe, vzIm): the colored draw of
    :func:`colored_complex_normal_pallas` plus its velocity weighting
    ``vz = delta * i * kznum / (kx2 + kyz2)`` fused in the same pass.

    Parameters:
        amp2d: (R, C) colour amplitudes (C a multiple of 128, R of 8).
        kx2col: (R, 1) squared kx per row.
        kyz2row: (1, C) ky^2+kz^2 per lane.
        kznumrow: (1, C) velocity numerator (vel_fac * kz, Nyquist-masked).
        seed: as in colored_complex_normal_pallas.
    """
    R, C = amp2d.shape
    dtype = amp2d.dtype
    assert C % 128 == 0 and R % 8 == 0, (R, C)
    br = 8
    dmax = max(1, int(_MAX_BLOCK_BYTES / (br * 128 * dtype.itemsize)))
    nlanes = C // 128
    d = max(dd for dd in range(1, min(dmax, nlanes) + 1) if nlanes % dd == 0)
    bc = 128 * d

    seed_arg = jnp.asarray(seed, jnp.int32).reshape(-1)
    if seed_arg.shape[0] == 1:
        seed_arg = jnp.concatenate([seed_arg, jnp.zeros(1, jnp.int32)])
    assert seed_arg.shape == (2,), seed_arg.shape
    bspec = pl.BlockSpec((br, bc), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM)
    colspec = pl.BlockSpec((br, 1), lambda i, j, *_: (i, 0),
                           memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, bc), lambda i, j, *_: (0, j),
                           memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _kernel_vz,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // br, C // bc),
            in_specs=[bspec, colspec, rowspec, rowspec],
            out_specs=[bspec, bspec, bspec, bspec],
        ),
        out_shape=[jax.ShapeDtypeStruct((R, C), dtype)] * 4,
        interpret=interpret,
    )(seed_arg, amp2d, kx2col.astype(dtype), kyz2row.astype(dtype),
      kznumrow.astype(dtype))
    return outs


@partial(jax.jit, static_argnames=("interpret",))
def colored_complex_normal_pallas(amp2d, seed, interpret: bool = False):
    """(Re, Im) of ``(n1 + i n2) * sqrt(0.5) * amp2d`` with n1,n2 ~ N(0,1).

    Parameters:
        amp2d: (R, C) real array, C a multiple of 128.
        seed: int32 scalar or (2,) vector (derive from a jax key with
            ``jax.random.bits(k, (2,), "uint32")``); each row-block
            reseeds with (seed[0], seed[1] ^ block_index).  A scalar is
            zero-extended (legacy 32-bit entropy).

    Returns:
        (re, im) arrays of amp2d's shape/dtype.
    """
    R, C = amp2d.shape
    dtype = amp2d.dtype
    assert C % 128 == 0, f"C={C} must be a multiple of 128"
    assert R % 8 == 0, f"R={R} must be a multiple of 8"
    # Mosaic tiling: the block's sublane dim must be a multiple of 8, the
    # lane dim a multiple of 128 — rows block at 8, columns at the
    # largest 128-multiple divisor of C under a ~1.3 MB per-buffer cap
    # (three resident blocks plus two uint32 bit temps stay well inside
    # the 16 MB scoped VMEM limit; see binned_pk.py's sizing note).
    br = 8
    dmax = max(1, int(_MAX_BLOCK_BYTES / (br * 128 * dtype.itemsize)))
    nlanes = C // 128
    d = max(dd for dd in range(1, min(dmax, nlanes) + 1)
            if nlanes % dd == 0)
    bc = 128 * d

    seed_arg = jnp.asarray(seed, jnp.int32).reshape(-1)
    if seed_arg.shape[0] == 1:
        seed_arg = jnp.concatenate([seed_arg, jnp.zeros(1, jnp.int32)])
    assert seed_arg.shape == (2,), f"seed must be scalar or (2,), got {seed_arg.shape}"
    bspec = pl.BlockSpec((br, bc), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM)
    re, im = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // br, C // bc),
            in_specs=[bspec],
            out_specs=[bspec, bspec],
        ),
        out_shape=[jax.ShapeDtypeStruct((R, C), dtype),
                   jax.ShapeDtypeStruct((R, C), dtype)],
        interpret=interpret,
    )(seed_arg, amp2d)
    return re, im
