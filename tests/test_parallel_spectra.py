"""Distributed estimators (parallel/spectra.py) vs the single-device
estimators (ops/spectra.py) — exact equality on matched cubes.

The reference's distributed estimator is nbodykit FFTPower/FFTCorr over
MPI; here the half-spectrum + kz-multiplicity-weight reductions must
reproduce the full-grid sums bit-for-bit in f64, including the odd-l
pairing rule and off-axis lines of sight.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fastbox_tpu.grid import GridSpec
from fastbox_tpu.ops.spectra import (correlation_function,
                                     correlation_multipoles,
                                     power_multipoles, power_spectrum)
from fastbox_tpu.parallel import (make_sharded_correlation,
                                  make_sharded_power_multipoles,
                                  make_sharded_power_spectrum)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

GRID = GridSpec.create(box_scale=(800.0,) * 3, nsamp=16, redshift=0.0)


def _space_mesh(space=4):
    return Mesh(np.asarray(jax.devices()[:space]), ("space",))


def _cubes(seed=3):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.standard_normal((16, 16, 16)))
    b = jnp.asarray(rng.standard_normal((16, 16, 16)))
    return a, b


def _assert_tree_close(got, want, rtol=1e-10):
    # atol covers full-grid cancellation residues: odd multipoles of a
    # statistically isotropic field are ~1e-12 on both sides (pure f64
    # roundoff against power magnitudes ~1e4), where rtol is meaningless.
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=rtol, atol=1e-8, equal_nan=True,
                                   err_msg=k)


def test_power_spectrum_1d_matches():
    a, _ = _cubes()
    fn = make_sharded_power_spectrum(_space_mesh(), GRID)
    _assert_tree_close(fn(a), power_spectrum(GRID, a))


def test_power_spectrum_2d_cross_offaxis_matches():
    a, b = _cubes(7)
    los = (1.0, 2.0, 2.0)
    fn = make_sharded_power_spectrum(_space_mesh(), GRID, nmu=4, los=los,
                                     cross=True)
    _assert_tree_close(fn(a, b),
                       power_spectrum(GRID, a, second=b, nmu=4, los=los))


def test_power_multipoles_match_including_odd():
    a, _ = _cubes(11)
    los = (0.0, 1.0, 1.0)
    poles = (0, 1, 2, 3, 4)
    fn = make_sharded_power_multipoles(_space_mesh(), GRID, poles=poles,
                                       los=los)
    _assert_tree_close(fn(a),
                       power_multipoles(GRID, a, poles=poles, los=los))


def test_correlation_matches():
    a, b = _cubes(13)
    fn = make_sharded_correlation(_space_mesh(), GRID, dr=40.0, cross=True)
    _assert_tree_close(fn(a, b),
                       correlation_function(GRID, a, second=b, dr=40.0))


def test_correlation_multipoles_match():
    a, _ = _cubes(17)
    poles = (0, 2)
    fn = make_sharded_correlation(_space_mesh(), GRID, dr=40.0, poles=poles)
    _assert_tree_close(fn(a),
                       correlation_multipoles(GRID, a, poles=poles, dr=40.0))


def test_power_spectrum_odd_n_matches():
    """Odd N exercises the no-Nyquist branches of the pairing rules."""
    N = 15
    grid = GridSpec.create(box_scale=(750.0,) * 3, nsamp=N, redshift=0.0)
    rng = np.random.default_rng(23)
    a = jnp.asarray(rng.standard_normal((N, N, N)))
    mesh = Mesh(np.asarray(jax.devices()[:3]), ("space",))

    fn = make_sharded_power_spectrum(mesh, grid, nmu=3, los=(1.0, 0.0, 1.0))
    _assert_tree_close(fn(a), power_spectrum(grid, a, nmu=3,
                                             los=(1.0, 0.0, 1.0)))

    fm = make_sharded_power_multipoles(mesh, grid, poles=(0, 1, 2))
    _assert_tree_close(fm(a), power_multipoles(grid, a, poles=(0, 1, 2)))
