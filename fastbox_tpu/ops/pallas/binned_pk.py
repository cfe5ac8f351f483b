"""Pallas TPU kernel: fused k-grid weighting + binned spectrum reduction.

This is the kernel the north star names (BASELINE.json): in a single pass
over |delta_k|^2, each x-slab computes its |k| values on the fly from three
1-D wavenumber vectors (never materialising the N^3 k-grid), digitizes them
against the bin edges with an unrolled comparison ladder, and accumulates
per-bin (sum, sum^2, count) in VMEM.  The sequential TPU grid accumulates
slab partials straight into the output block, so HBM traffic is exactly one
read of the power cube plus a few hundred bytes of output — compare the
reference's O(nbins * N^3) digitize loop (box.py:758-765).

Semantics match ops.spectra._binned_pk_core / np.digitize exactly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["binned_pk_pallas"]

_LANES = 128


def _kernel(kx2_ref, edges_ref, pk_ref, ky2_ref, kz2_ref, out_ref, *,
            nbins: int, nrows: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    pk = pk_ref[0]                       # (N, N)
    kx2 = kx2_ref[i]                     # scalar
    k = jnp.sqrt(kx2 + ky2_ref[:] + kz2_ref[:])  # (N, N) via broadcast

    # digitize(k, edges) == sum_b (edges[b] <= k)  (searchsorted 'right')
    idx = jnp.zeros(k.shape, jnp.int32)
    for b in range(nbins):
        idx = idx + (edges_ref[b] <= k).astype(jnp.int32)

    sums = []
    sumsqs = []
    counts = []
    for b in range(nbins):
        m = idx == b
        mf = m.astype(pk.dtype)
        sums.append(jnp.sum(jnp.where(m, pk, 0.0)))
        sumsqs.append(jnp.sum(jnp.where(m, pk * pk, 0.0)))
        counts.append(jnp.sum(mf))
    pad = [jnp.zeros((), pk.dtype)] * (_LANES - nbins)
    block = jnp.stack(
        [jnp.stack(sums + pad), jnp.stack(sumsqs + pad), jnp.stack(counts + pad)]
        + [jnp.zeros(_LANES, pk.dtype)] * (nrows - 3)
    )
    out_ref[:] += block


@partial(jax.jit, static_argnames=("interpret",))
def binned_pk_pallas(pk3d, kx2, ky2, kz2, edges, interpret: bool = False):
    """Per-bin (sum, sumsq, count) of a power cube, digitized by |k|.

    Parameters:
        pk3d: (N, N, N) real power values |delta_k|^2 (already normalised).
        kx2, ky2, kz2: squared 1-D physical wavenumbers per axis, (N,).
        edges: (nbins,) ascending bin edges (max 120).
        interpret: run in the Pallas interpreter (for CPU tests).

    Returns:
        (sums, sumsqs, counts), each (nbins,), where bin b collects elements
        with digitize(k, edges) == b (bin 0 = below edges[0]).
    """
    N = pk3d.shape[0]
    dtype = pk3d.dtype
    nbins = edges.shape[0]
    assert nbins <= 120, "binned_pk_pallas supports at most 120 bin edges"
    nrows = 8  # f32 sublane-aligned output block

    out = pl.pallas_call(
        partial(_kernel, nbins=int(nbins), nrows=nrows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # kx2, edges
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, N, N), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nrows, _LANES), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, _LANES), dtype),
        interpret=interpret,
    )(
        kx2.astype(dtype),
        edges.astype(dtype),
        pk3d,
        ky2.astype(dtype).reshape(N, 1),
        kz2.astype(dtype).reshape(1, N),
    )
    return out[0, :nbins], out[1, :nbins], out[2, :nbins]
