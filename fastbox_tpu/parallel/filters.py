"""Distributed foreground filters for slab-sharded datacubes.

The PCA clean inside the sharded pipeline (parallel/sharded.py step 7) as
a standalone user API: a (N, N, Nfreq) cube sharded over ``mesh['space']``
is cleaned without ever gathering — pixel means and the Nfreq x Nfreq
covariance are ``psum``s over 'space', the tiny eigendecomposition is
replicated, and the mode projection/subtraction stays local per pixel.

Single-chip counterpart: ``filters.pca.pca_filter`` (reference
fastbox/filters.py:93-183 conventions).  The frequency (LOS) axis is never
sharded (SURVEY.md §5.7), so any per-LOS filter composes locally.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..grid import GridSpec

__all__ = ["make_sharded_pca_filter"]


def make_sharded_pca_filter(mesh: Mesh, grid: GridSpec, nmodes: int = 4,
                            return_filtered: bool = True):
    """Build ``fn(data) -> (cleaned, fg_fit)`` for sharded (N, N, Nfreq) cubes.

    Matches ``filters.pca.pca_filter(data, nmodes)`` exactly on gathered
    inputs (tested): subtract the mean spectrum, eigendecompose the
    frequency covariance, remove the top-``nmodes`` subspace.
    """
    nshards = mesh.shape["space"]
    N = grid.N
    assert N % nshards == 0
    Np = N // nshards
    npix = N * N

    def step(data):
        nf = data.shape[-1]
        d2 = data.reshape(Np * N, nf)
        mean_spec = lax.psum(jnp.sum(d2, axis=0), "space") / npix
        x = d2 - mean_spec[None, :]
        # HIGHEST-precision GEMMs: bf16 covariance/projection rounding moves
        # the cleaned P(k) low bins ~4e-2 vs the f64 oracle (filters/pca.py)
        prec = jax.lax.Precision.HIGHEST
        cov = lax.psum(jnp.matmul(x.T, x, precision=prec), "space") \
            / (npix - 1)
        _, vecs = jnp.linalg.eigh(cov)
        U = vecs[:, ::-1][:, :nmodes]
        proj = jnp.matmul(x, U, precision=prec)
        fg = (jnp.matmul(proj, U.T, precision=prec)
              + mean_spec[None, :]).reshape(Np, N, nf)
        cleaned = data - fg
        if return_filtered:
            return cleaned, fg
        return cleaned

    out_specs = (P("space"), P("space")) if return_filtered else P("space")
    sharded = shard_map(step, mesh=mesh, in_specs=P("space"),
                        out_specs=out_specs, check_vma=False)
    return jax.jit(sharded)
