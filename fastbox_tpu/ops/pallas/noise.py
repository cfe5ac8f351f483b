"""Pallas TPU kernel: fused add-scaled-Gaussian-noise.

``x + scale * N(0,1)`` is two of the pipeline's stages (radiometer noise
with a per-channel sigma(nu), box.py analog noise.py:73-74; and the RSD
sigma_NL velocity dispersion, box.py:416-418).  The stock path draws
threefry bits, converts with erfinv, materialises the normals, and adds —
three-plus HBM passes.  Here the on-core PRNG (pltpu.prng_random_bits)
generates bits in VMEM and a Box-Muller transform feeds the add directly:
HBM traffic is one read of x plus one write of the result.

The normals are exact N(0,1) draws (Box-Muller on 24-bit uniforms), but the
stream differs from jax.random.normal — statistically equivalent, not
bit-identical.  Callers that need reproducibility against the threefry
stream must keep the jnp path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["add_scaled_normal_pallas"]

_BLOCK_R = 256
_TWO_PI = 6.283185307179586


def _box_muller(shape, dtype):
    """Two independent N(0,1) fields from on-core random bits."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # 24-bit uniforms in (0, 1]: never 0, so log is finite.  Mosaic has no
    # uint32 -> float cast; the shifted bits fit in 24 bits, so a bitcast
    # through int32 is exact.
    i1 = pltpu.bitcast(b1 >> 8, jnp.int32)
    i2 = pltpu.bitcast(b2 >> 8, jnp.int32)
    u1 = i1.astype(dtype) * dtype.type(2.0**-24) + dtype.type(2.0**-25)
    u2 = i2.astype(dtype) * dtype.type(2.0**-24)
    r = jnp.sqrt(dtype.type(-2.0) * jnp.log(u1))
    th = dtype.type(_TWO_PI) * u2
    return r * jnp.cos(th), r * jnp.sin(th)


def _normals(shape, dtype):
    """Exact N(0,1) block.

    Uses BOTH Box-Muller outputs when the row count is even (the cos and
    sin branches are independent normals), halving the PRNG-bit and
    log/sqrt/trig cost per value; block rows are 256 in practice so the
    odd fallback only covers degenerate shapes.
    """
    br, c = shape
    if br % 2 == 0:
        n1, n2 = _box_muller((br // 2, c), dtype)
        return jnp.concatenate([n1, n2], axis=0)
    n, _ = _box_muller(shape, dtype)
    return n


def _kernel(seed_ref, x_ref, scale_ref, out_ref):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    x = x_ref[:]                          # (BR, C)
    n = _normals(x.shape, jnp.dtype(x.dtype))
    out_ref[:] = x + scale_ref[:] * n     # scale (1, C) broadcasts


def _kernel_max(seed_ref, x_ref, scale_ref, out_ref, max_ref):
    """As _kernel, also emitting max|out| (a free scalar by-product the
    RSD remap uses as its displacement bound — it saves a separate
    full-cube reduction pass).  The running maximum accumulates into ONE
    (1, 1) SMEM cell across the sequential grid (the per-block-row
    (nblk, 1) layout overflowed the 1 MB SMEM at 768^3, where nblk=2304
    — scripts/maxn_logs/pipeline_768.log, round 5)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    x = x_ref[:]
    n = _normals(x.shape, jnp.dtype(x.dtype))
    y = x + scale_ref[:] * n
    out_ref[:] = y
    m = jnp.max(jnp.abs(y))

    @pl.when(pl.program_id(0) == 0)
    def _():
        max_ref[0, 0] = m

    @pl.when(pl.program_id(0) != 0)
    def _():
        max_ref[0, 0] = jnp.maximum(max_ref[0, 0], m)


@partial(jax.jit, static_argnames=("interpret", "return_max"))
def add_scaled_normal_pallas(x2d, scale_row, seed, interpret: bool = False,
                             return_max: bool = False):
    """x2d + scale_row[None, :] * N(0,1), fused in VMEM.

    Parameters:
        x2d: (R, C) real array, R a multiple of 256, C a multiple of 128.
        scale_row: (C,) per-column scale (pass a constant row for a
            scalar sigma).
        seed: int32 scalar (derive from a jax key with jax.random.bits);
            each row-block reseeds with (seed, block_index).
        return_max: also return ``max|result|`` (a scalar), computed from
            per-block maxima inside the kernel at no extra HBM pass.

    Returns:
        (R, C) array, same dtype as x2d; with ``return_max`` a
        ``(out, maxabs)`` tuple.
    """
    R, C = x2d.shape
    dtype = x2d.dtype
    br = min(_BLOCK_R, R)
    assert R % br == 0, f"R={R} must be a multiple of {br}"
    nblk = R // br

    seed_arg = jnp.asarray(seed, jnp.int32).reshape(1)
    scale_arg = scale_row.astype(dtype).reshape(1, C)
    dspec_in = [
        pl.BlockSpec((br, C), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
    ]
    dspec_out = pl.BlockSpec((br, C), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
    if not return_max:
        return pl.pallas_call(
            _kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nblk,),
                in_specs=dspec_in,
                out_specs=dspec_out,
            ),
            out_shape=jax.ShapeDtypeStruct((R, C), dtype),
            interpret=interpret,
        )(seed_arg, x2d, scale_arg)
    out, bmax = pl.pallas_call(
        _kernel_max,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=dspec_in,
            out_specs=[
                dspec_out,
                pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((R, C), dtype),
                   jax.ShapeDtypeStruct((1, 1), dtype)],
        interpret=interpret,
    )(seed_arg, x2d, scale_arg)
    return out, bmax[0, 0]
