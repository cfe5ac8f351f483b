"""RSD remap vs the scipy-griddata oracle (the reference's exact code path)."""
import jax
import jax.numpy as jnp
import numpy as np

import oracle
from fastbox_tpu.fields import gaussian
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.ops.rsd import redshift_space_density

N = 16
GRID = GridSpec.create(box_scale=(1e2, 1e2, 1e2), nsamp=N, redshift=0.0)


def _setup(cosmo):
    key = jax.random.PRNGKey(7)
    dx, dk = gaussian.realise_density(key, GRID, cosmo, dtype=jnp.float64)
    v = gaussian.realise_velocity(dk, GRID, cosmo)
    vz = jnp.fft.ifftn(v[2]).real
    Hz = 100.0 * cosmo.h * cosmo.Ea
    return np.asarray(dx), np.asarray(vz), Hz


def test_rsd_linear_matches_scipy(cosmo_z0):
    dx, vz, Hz = _setup(cosmo_z0)
    out_j = redshift_space_density(jnp.asarray(dx), jnp.asarray(vz), GRID, Hz,
                                   method="linear")
    out_o = oracle.redshift_space_density(dx, vz, np.asarray(GRID.z), Hz,
                                          method="linear")
    assert np.allclose(np.asarray(out_j), out_o, rtol=1e-9, atol=1e-11)


def test_rsd_nearest_matches_scipy(cosmo_z0):
    dx, vz, Hz = _setup(cosmo_z0)
    out_j = redshift_space_density(jnp.asarray(dx), jnp.asarray(vz), GRID, Hz,
                                   method="nearest")
    out_o = oracle.redshift_space_density(dx, vz, np.asarray(GRID.z), Hz,
                                          method="nearest")
    assert np.allclose(np.asarray(out_j), out_o, rtol=1e-9, atol=1e-11)


def test_rsd_large_velocity(cosmo_z0):
    # Velocities large enough to shuffle ordering along the LOS (wraps,
    # non-monotonic s) must still match scipy exactly.
    dx, vz, Hz = _setup(cosmo_z0)
    vz = vz * 50.0
    out_j = redshift_space_density(jnp.asarray(dx), jnp.asarray(vz), GRID, Hz)
    out_o = oracle.redshift_space_density(dx, vz, np.asarray(GRID.z), Hz)
    assert np.allclose(np.asarray(out_j), out_o, rtol=1e-8, atol=1e-10)


def test_rsd_sigma_nl_valid(cosmo_z0):
    dx, vz, Hz = _setup(cosmo_z0)
    out = redshift_space_density(jnp.asarray(dx), jnp.asarray(vz), GRID, Hz,
                                 sigma_nl=200.0, key=jax.random.PRNGKey(1))
    out = np.asarray(out)
    assert out.shape == (N, N, N)
    assert np.all(np.isfinite(out))


def test_rsd_banded_fallback_extreme_velocities(cosmo_z0):
    """Velocities displacing material far beyond the banded window must
    trigger the exact full fallback and still match scipy griddata."""
    dx, vz, Hz = _setup(cosmo_z0)
    vz = vz * 40.0  # displacements of many cells -> maxdisp > band * dz
    out_j = redshift_space_density(jnp.asarray(dx), jnp.asarray(vz), GRID, Hz,
                                   method="linear")
    out_o = oracle.redshift_space_density(dx, vz, np.asarray(GRID.z), Hz,
                                          method="linear")
    assert np.allclose(np.asarray(out_j), out_o, rtol=1e-9, atol=1e-11)


def test_banded_interp_equals_full_telescoping(rng):
    """The banded O(w) path must equal the O(C) telescoping sum exactly
    whenever the displacement bound holds."""
    from jax import lax
    from fastbox_tpu.ops.rsd import _interp_sorted_banded, remap_los_batched

    M, C, w = 32, 24, 3
    zt = np.linspace(0.0, 23.0, C)
    dz = zt[1] - zt[0]
    s = zt[None, :] + rng.uniform(-w * dz * 0.9, w * dz * 0.9, size=(M, C))
    v = rng.standard_normal((M, C))
    ss, vv = lax.sort_key_val(jnp.asarray(s), jnp.asarray(v))
    got = np.asarray(_interp_sorted_banded(ss, vv, jnp.asarray(zt), w))

    dv = np.asarray(vv)[:, 1:] - np.asarray(vv)[:, :-1]
    ds = np.asarray(ss)[:, 1:] - np.asarray(ss)[:, :-1]
    frac = (zt[None, None, :] - np.asarray(ss)[:, :-1, None]) / ds[:, :, None]
    want = np.asarray(vv)[:, :1] + np.sum(dv[:, :, None]
                                          * np.clip(frac, 0.0, 1.0), axis=1)
    assert np.allclose(got, want, rtol=1e-12, atol=1e-12)
