"""Mesh-independent row-keyed noise draws.

The sharded pipeline cannot draw ``normal(key, (N, N, N))`` like the
single-chip path — each slab owns only ``N/P`` leading rows, and JAX has no
API for generating an offset sub-range of a larger draw.  Instead every
noise field is drawn **per leading-axis row**, with the row's PRNG key
derived as ``fold_in(fold_in(key, tag), global_row_index)``:

  * a slab draws exactly its own rows by offsetting the row index, so the
    realisation is INDEPENDENT of the mesh shape (1 chip, 8 chips and the
    single-device pipeline in ``noise_scheme='rows'`` mode all produce the
    same field for the same key);
  * tags separate the independent noise streams of one realisation.

The single-chip pipeline's default ``noise_scheme='half'`` keeps the faster
direct half-spectrum draw (one fewer FFT); 'rows' exists for exact
single-vs-sharded parity testing and for runs that must be reproducible
across device counts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["TAGS", "row_normal", "row_complex_normal"]

# Stream tags (arbitrary distinct constants, stable across versions)
TAGS = {
    "density": 1,
    "sigma_nl": 17,
    "fg_re": 101,
    "fg_im": 102,
    "alpha": 103,
    "noise": 202,
    "halos": 301,
}


def row_normal(key, tag: int, row0, nrows: int, row_shape, dtype):
    """Draw ``nrows`` standard-normal rows starting at global row ``row0``.

    Returns shape ``(nrows, *row_shape)``.  ``row0`` may be a traced value
    (e.g. ``axis_index * rows_per_shard`` inside shard_map).
    """
    base = jax.random.fold_in(key, tag)

    def one(i):
        return jax.random.normal(jax.random.fold_in(base, i), row_shape,
                                 dtype)

    return jax.vmap(one)(row0 + jnp.arange(nrows))


def row_complex_normal(key, re_tag: int, im_tag: int, row0, nrows: int,
                       row_shape, dtype):
    """Complex rows ``re + i im`` with independent unit-normal parts."""
    re = row_normal(key, re_tag, row0, nrows, row_shape, dtype)
    im = row_normal(key, im_tag, row0, nrows, row_shape, dtype)
    return re + 1j * im
