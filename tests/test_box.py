"""CosmoBox shim tests, mirroring the reference test suite
(/root/reference/fastbox/tests/test_box.py structure and assertions)."""
import jax.numpy as jnp
import numpy as np
import pytest

from fastbox_tpu.box import CosmoBox, default_cosmo


def test_gaussian_box():
    box = CosmoBox(cosmo=default_cosmo, box_scale=(1e2, 1e2, 1e2), nsamp=16,
                   realise_now=False, seed=11)
    box.realise_density()
    assert box.delta_x.shape == (16, 16, 16)
    assert box.delta_x.dtype == jnp.float64  # x64 enabled in tests
    assert np.all(~np.isnan(np.asarray(box.delta_x)))

    # Same seed + realise_now=True must give the identical field
    box2 = CosmoBox(cosmo=default_cosmo, box_scale=1e2, nsamp=16,
                    redshift=0.0, realise_now=True, seed=11)
    assert np.allclose(np.asarray(box.delta_x), np.asarray(box2.delta_x))

    assert box.Lx == box.Ly == box.Lz == 1e2
    assert box.x.size == box.y.size == box.z.size == 16
    assert np.isclose(np.max(box.x) - np.min(box.x), 1e2)

    # Cuboidal boxes
    box3 = CosmoBox(cosmo=default_cosmo, box_scale=(1e2, 2e2, 1e3), nsamp=16,
                    redshift=1.0, realise_now=True)
    assert box3.delta_x.shape == (16, 16, 16)
    assert np.all(~np.isnan(np.asarray(box3.delta_x)))


def test_lognormal_box():
    box = CosmoBox(cosmo=default_cosmo, box_scale=(1e2, 1e2, 1e2), nsamp=16,
                   realise_now=True, seed=11)
    delta_log = np.asarray(box.lognormal(box.delta_x))
    assert delta_log.shape == (16, 16, 16)
    assert np.all(~np.isnan(delta_log))
    assert np.all(delta_log >= -1.0)


def test_box_redshift_space_density():
    box = CosmoBox(cosmo=default_cosmo, box_scale=(1e2, 1e2, 1e2), nsamp=16,
                   realise_now=False, seed=11)
    box.realise_density()
    box.realise_velocity()
    vel_z = jnp.fft.ifftn(box.velocity_k[2]).real
    delta_s = box.redshift_space_density(delta_x=box.delta_x, velocity_z=vel_z,
                                         sigma_nl=200.0, method="linear")
    assert delta_s.shape == (16, 16, 16)
    assert np.all(~np.isnan(np.asarray(delta_s)))


def test_box_transfer_function():
    box = CosmoBox(cosmo=default_cosmo, box_scale=(1e2, 1e2, 1e2), nsamp=16,
                   realise_now=True, seed=11)
    transfer_fn = lambda k_perp, k_par: (
        (1.0 - jnp.exp(-0.5 * (k_par / 0.001) ** 2))
        * jnp.exp(-0.5 * (k_perp / 0.1) ** 2)
    )
    delta_smoothed = box.apply_transfer_fn(box.delta_k, transfer_fn=transfer_fn)
    assert delta_smoothed.shape == (16, 16, 16)
    assert np.all(~np.isnan(np.asarray(delta_smoothed)))


def test_box_power_spectrum():
    box = CosmoBox(cosmo=default_cosmo, box_scale=(1e3, 1e3, 1e3), nsamp=64,
                   realise_now=False, seed=14)
    box.realise_density()
    re_k, re_pk, re_stddev = box.binned_power_spectrum()
    th_k, th_pk = box.theoretical_power_spectrum()
    assert np.all(np.isfinite(th_pk))

    sigR = box.sigmaR(R=8.0)
    sig8 = box.sigma8()
    assert np.isclose(sigR, sig8)

    box.test_sampling_error()

    # Same empirical tolerance as the reference (test_box.py:122)
    assert np.abs(sig8 - box.cosmo["sigma8"]) < 0.09


def test_box_coordinates():
    box = CosmoBox(cosmo=default_cosmo, box_scale=(1e3, 1e3, 1e3), nsamp=16,
                   realise_now=True, redshift=0.8, seed=22)
    ang_x, ang_y = box.pixel_array()
    ang_x2, ang_y2 = box.pixel_array(redshift=0.82)
    assert np.all(~np.isnan(ang_x)) and np.all(~np.isnan(ang_y))
    assert np.all(~np.isnan(ang_x2)) and np.all(~np.isnan(ang_y2))
    assert np.isclose(ang_x[1] - ang_x[0], ang_y[1] - ang_y[0])
    # Higher z => further away => smaller angular pixels
    assert ang_x[1] - ang_x[0] > ang_x2[1] - ang_x2[0]
    assert ang_y[1] - ang_y[0] > ang_y2[1] - ang_y2[0]
    # Frequencies descend with z coordinate
    assert np.all(np.diff(box.freq_array()) < 0.0)
    assert np.all(np.diff(box.freq_array(redshift=2.0)) < 0.0)


def test_box_kgrid_attributes():
    """Reference-compatible Kx/Ky/Kz/k attributes (box.py:110-127)."""
    box = CosmoBox(cosmo=default_cosmo, box_scale=(1e2, 2e2, 4e2), nsamp=8,
                   realise_now=False)
    idx = np.fft.fftfreq(8, 1.0) * 8
    assert np.allclose(box.Kx[:, 0, 0], idx)
    assert np.allclose(box.Ky[0, :, 0], idx)
    assert np.allclose(box.Kz[0, 0, :], idx)
    want = 2.0 * np.pi * np.sqrt((box.Kx / 100.0) ** 2 + (box.Ky / 200.0) ** 2
                                 + (box.Kz / 400.0) ** 2)
    assert np.allclose(box.k, want)
    assert np.isclose(box.boxfactor, 8.0**6 / (1e2 * 2e2 * 4e2))


def test_box_errors():
    with pytest.raises(TypeError):
        CosmoBox(cosmo=[0.7, 0.3], box_scale=(1e2, 1e2, 1e2), nsamp=16,
                 realise_now=False)


def test_box_builtin_tests():
    box = CosmoBox(cosmo=default_cosmo, box_scale=(1e2, 1e2, 1e2), nsamp=16,
                   realise_now=True)
    s1, s2 = box.test_parseval()
    assert np.isclose(s1, s2)
