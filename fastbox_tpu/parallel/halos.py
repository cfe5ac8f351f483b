"""Slab-sharded Poisson halo sampling.

The reference's halo workload (examples/example_halos.py: lognormal field
-> Poisson halo counts -> cross-spectra via nbodykit/MPI) runs here as
SPMD: counts are drawn per voxel on each slab with the mesh-independent
row-keyed scheme (parallel/rng.py), so a realisation is a function of its
key alone — 1-shard and 8-shard runs produce the same catalogue-count
field.  Pairs with ``parallel.spectra`` (distributed cross P(k)) and the
sharded COLA/ensemble fields so the halo pipeline never gathers a cube.

Single-chip counterpart: ``models.halos.halo_count_field``
(/root/reference/fastbox/halos.py:53-117 conventions: rate clip only in
the non-lognormal branch, nan_to_num inside the rate).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..grid import GridSpec
from .rng import TAGS

__all__ = ["make_sharded_halo_counts", "row_poisson"]


def row_poisson(key, tag: int, row0, lam):
    """Poisson draws with per-leading-row keys (the row_normal analog).

    ``lam`` is (nrows, ...); row ``i`` uses key
    ``fold_in(fold_in(key, tag), row0 + i)`` so slabs draw exactly their
    own rows regardless of the mesh shape.
    """
    base = jax.random.fold_in(key, tag)
    nrows = lam.shape[0]

    def one(i, lam_row):
        return jax.random.poisson(jax.random.fold_in(base, i), lam_row)

    return jax.vmap(one)(row0 + jnp.arange(nrows), lam)


def make_sharded_halo_counts(mesh: Mesh, grid: GridSpec, nbar: float,
                             bias: float, lognormal: bool = False,
                             return_overdensity: bool = False,
                             dtype=jnp.float32):
    """Build ``fn(key, delta_x) -> counts`` for slab-sharded fields.

    ``delta_x`` is (N, N, N) sharded over ``mesh['space']``; the result has
    the same sharding.  With ``return_overdensity`` the halo overdensity
    ``n/<n> - 1`` (global mean via psum) is returned instead of raw counts
    — ready for ``parallel.spectra`` cross-spectra.
    """
    dtype = jnp.dtype(dtype)
    nshards = mesh.shape["space"]
    N = grid.N
    assert N % nshards == 0
    Np = N // nshards
    voxel_vol = grid.voxel_volume

    def step(key, delta_x):
        row0 = lax.axis_index("space") * Np
        delta_h = dtype.type(bias) * delta_x.astype(dtype)
        if lognormal:
            d = jnp.exp(delta_h)
            mean = lax.psum(jnp.sum(d), "space") / N**3
            delta_h = d / mean - 1.0
        rate = dtype.type(voxel_vol * nbar) * (1.0 + delta_h)
        if not lognormal:
            rate = jnp.maximum(rate, 0.0)
        counts = row_poisson(key, TAGS["halos"], row0,
                             jnp.nan_to_num(rate)).astype(dtype)
        if not return_overdensity:
            return counts
        mean_n = lax.psum(jnp.sum(counts), "space") / N**3
        # An empty draw (mean 0) has no defined overdensity; return the
        # zero field rather than silently poisoning spectra with NaN.
        safe = jnp.maximum(mean_n, dtype.type(1e-30))
        return jnp.where(mean_n > 0, counts / safe - 1.0, 0.0)

    sharded = shard_map(step, mesh=mesh, in_specs=(P(), P("space")),
                        out_specs=P("space"), check_vma=False)
    return jax.jit(sharded)
