"""Sharded Poisson halo sampling: mesh invariance + rate exactness +
an end-to-end sharded halo cross-spectrum (the example_halos workload)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fastbox_tpu.grid import GridSpec
from fastbox_tpu.parallel import (make_sharded_halo_counts,
                                  make_sharded_power_spectrum)
from fastbox_tpu.parallel.halos import row_poisson
from fastbox_tpu.parallel.rng import TAGS

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

GRID = GridSpec.create(box_scale=(1e3,) * 3, nsamp=16, redshift=0.0)


def _space_mesh(space=4):
    return Mesh(np.asarray(jax.devices()[:space]), ("space",))


def _delta(seed=3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(0.5 * rng.standard_normal((16, 16, 16)))


def test_counts_mesh_invariant_and_rate_exact():
    """2-vs-4-shard equality AND exact equality with the row-keyed draw
    evaluated directly on one device (same fold_in construction)."""
    delta = _delta()
    key = jax.random.PRNGKey(9)
    nbar, bias = 1e-3, 1.6

    outs = {}
    for space in (2, 4):
        fn = make_sharded_halo_counts(_space_mesh(space), GRID, nbar, bias)
        outs[space] = np.asarray(fn(key, delta))
    np.testing.assert_array_equal(outs[2], outs[4])

    rate = np.maximum(GRID.voxel_volume * nbar
                      * (1.0 + bias * np.asarray(delta, np.float32)), 0.0)
    direct = np.asarray(row_poisson(key, TAGS["halos"], 0,
                                    jnp.asarray(rate)))
    np.testing.assert_array_equal(outs[4], direct.astype(np.float32))

    # Totals are Poisson-sensible: mean count ~ nbar * V_voxel
    assert abs(outs[4].mean() / (nbar * GRID.voxel_volume) - 1.0) < 0.2


def test_lognormal_counts_and_cross_spectrum():
    """Lognormal rate branch + distributed halo x matter cross P(k):
    the cross power is positive on large scales (halos trace the field)."""
    delta = _delta(11)
    key = jax.random.PRNGKey(4)
    mesh = _space_mesh(4)
    fn = make_sharded_halo_counts(mesh, GRID, nbar=5e-3, bias=1.0,
                                  lognormal=True, return_overdensity=True,
                                  dtype=jnp.float64)
    delta_h = fn(key, delta)
    assert abs(float(jnp.mean(delta_h))) < 1e-10

    ps = make_sharded_power_spectrum(mesh, GRID, cross=True)
    out = ps(delta_h, delta)
    power = np.asarray(out["power"])
    assert np.isfinite(power[np.asarray(out["modes"]) > 0]).all()
    # large-scale cross power positive (first populated bins)
    pop = power[np.asarray(out["modes"]) > 0]
    assert pop[:2].min() > 0.0
