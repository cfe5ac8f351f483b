"""Public-contract tests for the ``CosmoBox`` OO shim.

These assert the same observable behaviour the reference guarantees of its
``CosmoBox`` (shapes, NaN-freeness, seed reproducibility, coordinate
physics, Parseval, the 0.09 sigma8 statistical bound — see
/root/reference/fastbox/tests/test_box.py), expressed against the
fastbox_tpu API, plus k-grid/boxfactor checks the reference never had.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fastbox_tpu.box import CosmoBox, default_cosmo

CUBE = (1e2, 1e2, 1e2)


def _finite(a) -> bool:
    return bool(np.isfinite(np.asarray(a)).all())


def test_gaussian_box():
    b = CosmoBox(cosmo=default_cosmo, box_scale=CUBE, nsamp=16,
                 realise_now=False, seed=11)
    b.realise_density()
    assert b.delta_x.shape == (16, 16, 16)
    assert b.delta_x.dtype == jnp.float64  # conftest enables x64
    assert _finite(b.delta_x)

    # Deterministic in the seed: deferred realisation and realise_now=True
    # must agree bit-for-bit (a scalar box_scale means a cube).
    b_eager = CosmoBox(cosmo=default_cosmo, box_scale=1e2, nsamp=16,
                       redshift=0.0, realise_now=True, seed=11)
    np.testing.assert_allclose(np.asarray(b.delta_x),
                               np.asarray(b_eager.delta_x))

    # Geometry attributes
    assert (b.Lx, b.Ly, b.Lz) == CUBE
    for coord in (b.x, b.y, b.z):
        assert coord.size == 16
    assert np.isclose(b.x.max() - b.x.min(), 1e2)

    # Anisotropic (cuboid) boxes realise fine too
    b_aniso = CosmoBox(cosmo=default_cosmo, box_scale=(1e2, 2e2, 1e3),
                       nsamp=16, redshift=1.0, realise_now=True)
    assert b_aniso.delta_x.shape == (16, 16, 16)
    assert _finite(b_aniso.delta_x)


def test_lognormal_box():
    b = CosmoBox(cosmo=default_cosmo, box_scale=CUBE, nsamp=16,
                 realise_now=True, seed=11)
    ln = np.asarray(b.lognormal(b.delta_x))
    assert ln.shape == (16, 16, 16)
    assert _finite(ln)
    # exp(delta)/<exp(delta)> - 1 is bounded below by -1 by construction
    assert ln.min() >= -1.0


def test_box_redshift_space_density():
    b = CosmoBox(cosmo=default_cosmo, box_scale=CUBE, nsamp=16,
                 realise_now=False, seed=11)
    b.realise_density()
    b.realise_velocity()
    v_los = jnp.fft.ifftn(b.velocity_k[2]).real
    # Large sigma_nl stresses the shell-crossing / resort machinery
    ds = b.redshift_space_density(delta_x=b.delta_x, velocity_z=v_los,
                                  sigma_nl=200.0, method="linear")
    assert ds.shape == (16, 16, 16)
    assert _finite(ds)


def test_box_transfer_function():
    b = CosmoBox(cosmo=default_cosmo, box_scale=CUBE, nsamp=16,
                 realise_now=True, seed=11)

    def tfn(k_perp, k_par):
        hipass_par = 1.0 - jnp.exp(-0.5 * (k_par / 0.001) ** 2)
        lopass_perp = jnp.exp(-0.5 * (k_perp / 0.1) ** 2)
        return hipass_par * lopass_perp

    out = b.apply_transfer_fn(b.delta_k, transfer_fn=tfn)
    assert out.shape == (16, 16, 16)
    assert _finite(out)


def test_box_power_spectrum():
    b = CosmoBox(cosmo=default_cosmo, box_scale=(1e3,) * 3, nsamp=64,
                 realise_now=False, seed=14)
    b.realise_density()
    b.binned_power_spectrum()
    _, pk_theory = b.theoretical_power_spectrum()
    assert _finite(pk_theory)

    # sigmaR at R=8 is sigma8 by definition
    assert np.isclose(b.sigmaR(R=8.0), b.sigma8())

    b.test_sampling_error()

    # One 64^3 realisation scatters around the input sigma8; the reference
    # uses an empirically chosen 0.09 window (its test_box.py:122) and so
    # do we.
    assert abs(b.sigma8() - b.cosmo["sigma8"]) < 0.09


def test_box_coordinates():
    b = CosmoBox(cosmo=default_cosmo, box_scale=(1e3,) * 3, nsamp=16,
                 realise_now=True, redshift=0.8, seed=22)
    ax_lo, ay_lo = b.pixel_array()
    ax_hi, ay_hi = b.pixel_array(redshift=0.82)
    for arr in (ax_lo, ay_lo, ax_hi, ay_hi):
        assert _finite(arr)
    # Cubic voxels of a cubic box subtend equal angles in x and y...
    assert np.isclose(ax_lo[1] - ax_lo[0], ay_lo[1] - ay_lo[0])
    # ...and shrink on the sky as the box recedes
    assert ax_lo[1] - ax_lo[0] > ax_hi[1] - ax_hi[0]
    assert ay_lo[1] - ay_lo[0] > ay_hi[1] - ay_hi[0]
    # The LOS axis maps to a strictly descending frequency ladder
    assert (np.diff(b.freq_array()) < 0.0).all()
    assert (np.diff(b.freq_array(redshift=2.0)) < 0.0).all()


def test_box_kgrid_attributes():
    """Reference-compatible Kx/Ky/Kz/k attributes (box.py:110-127)."""
    b = CosmoBox(cosmo=default_cosmo, box_scale=(1e2, 2e2, 4e2), nsamp=8,
                 realise_now=False)
    fft_idx = np.fft.fftfreq(8, 1.0) * 8
    np.testing.assert_allclose(b.Kx[:, 0, 0], fft_idx)
    np.testing.assert_allclose(b.Ky[0, :, 0], fft_idx)
    np.testing.assert_allclose(b.Kz[0, 0, :], fft_idx)
    kmag = 2.0 * np.pi * np.sqrt((b.Kx / 1e2) ** 2 + (b.Ky / 2e2) ** 2
                                 + (b.Kz / 4e2) ** 2)
    np.testing.assert_allclose(b.k, kmag)
    assert np.isclose(b.boxfactor, 8.0**6 / (1e2 * 2e2 * 4e2))


def test_box_errors():
    # A bare list is not a valid cosmology specification
    with pytest.raises(TypeError):
        CosmoBox(cosmo=[0.7, 0.3], box_scale=CUBE, nsamp=16,
                 realise_now=False)


def test_box_builtin_tests():
    b = CosmoBox(cosmo=default_cosmo, box_scale=CUBE, nsamp=16,
                 realise_now=True)
    lhs, rhs = b.test_parseval()
    assert np.isclose(lhs, rhs)
