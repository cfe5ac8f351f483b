"""Pallas kernels in interpreter mode vs the XLA reference path."""
import jax
import jax.numpy as jnp
import numpy as np

from fastbox_tpu.grid import GridSpec
from fastbox_tpu.ops.pallas.binned_pk import binned_pk_pallas
from fastbox_tpu.ops.reduce import binned_sum_sumsq_count


def test_binned_pk_pallas_matches_reference(rng):
    N = 16
    grid = GridSpec.create(box_scale=(1e2, 2e2, 3e2), nsamp=N)
    pk3d = jnp.asarray(rng.random((N, N, N)), dtype=jnp.float32)
    kx, ky, kz = grid.kvec(jnp.float32)
    edges = jnp.asarray(
        np.logspace(np.log10(grid.kmin), np.log10(grid.kmax), 20),
        dtype=jnp.float32)

    s_p, q_p, c_p = binned_pk_pallas(pk3d, kx**2, ky**2, kz**2, edges,
                                     interpret=True)

    kmag = grid.kmag(jnp.float32)
    idx = jnp.searchsorted(edges, kmag.ravel(), side="right")
    s_r, q_r, c_r = binned_sum_sumsq_count(pk3d.ravel(), idx, 20)

    assert np.allclose(np.asarray(c_p), np.asarray(c_r))
    assert np.allclose(np.asarray(s_p), np.asarray(s_r), rtol=1e-5)
    assert np.allclose(np.asarray(q_p), np.asarray(q_r), rtol=1e-5)
