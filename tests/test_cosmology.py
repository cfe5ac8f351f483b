"""Cosmology module: EH transfer, growth, distances, halofit."""
import numpy as np
import pytest

from fastbox_tpu.cosmology import (
    CosmoParams,
    background as bg,
    build_cosmology,
    eisenstein_hu as eh,
    halofit_power,
)

COSMO = CosmoParams()


def test_transfer_limits():
    # T -> 1 as k -> 0; monotonically small at high k
    T = eh.transfer_eh98(COSMO, np.array([1e-6, 1e-4, 1.0, 10.0]))
    assert abs(T[0] - 1.0) < 1e-3
    assert T[1] > 0.9
    assert 0 < T[3] < T[2] < 0.1


def test_transfer_has_bao_wiggles():
    # The full EH98 transfer has oscillatory structure around 0.05-0.3 Mpc^-1:
    # the ratio to a smooth power-law trend should change sign several times.
    k = np.logspace(np.log10(0.05), np.log10(0.5), 400)
    T = eh.transfer_eh98(COSMO, k)
    logT = np.log(T)
    trend = np.polyval(np.polyfit(np.log(k), logT, 3), np.log(k))
    resid = logT - trend
    signs = np.sign(resid)
    flips = np.sum(signs[1:] != signs[:-1])
    assert flips >= 4, f"expected BAO oscillations, got {flips} sign flips"


def test_sigma8_normalisation():
    pk = eh.linear_power_z0(COSMO, np.logspace(-5, 3, 2000))
    assert np.all(pk >= 0)
    # sigma_R of the normalised spectrum at R=8/h must equal sigma8
    norm = (COSMO.sigma8 / eh.sigma_r_unnorm(COSMO, 8.0 / COSMO.h)) ** 2
    # the module normalises by exactly this factor; closure check via table
    c = build_cosmology(COSMO, 0.0)
    k = np.logspace(-4, 2, 500)
    ratio = np.asarray(c.pk_lin(k)) / eh.linear_power_z0(COSMO, k)
    assert np.allclose(ratio, 1.0, rtol=1e-5)
    assert norm > 0


def test_growth():
    a = np.array([0.1, 0.5, 1.0])
    D = bg.growth_factor(COSMO, a)
    assert abs(D[-1] - 1.0) < 1e-6
    assert np.all(np.diff(D) > 0)
    f = bg.growth_rate(COSMO, a)
    # f ~ Omega_m(a)^0.55 approximation to ~2%
    approx = bg.omega_m_of_a(COSMO, a) ** 0.55
    assert np.allclose(f, approx, rtol=0.02)


def test_distances():
    z = np.array([0.1, 0.5, 1.0, 2.0])
    chi = bg.comoving_radial_distance(COSMO, 1.0 / (1.0 + z))
    assert np.all(np.diff(chi) > 0)
    # Low-z limit: chi ~ (c/H0) z
    assert np.isclose(chi[0], 299792.458 / 70.0 * 0.1, rtol=0.05)
    assert bg.comoving_radial_distance(COSMO, 1.0) == 0.0


def test_halofit():
    k = np.logspace(-4, 2, 600)
    pk_lin = eh.linear_power_z0(COSMO, k)
    pk_nl = halofit_power(COSMO, k, pk_lin, a=1.0)
    # Linear on large scales
    low = k < 0.01
    assert np.allclose(pk_nl[low], pk_lin[low], rtol=0.05)
    # Substantially enhanced on small scales
    assert pk_nl[k > 1.0][0] > 1.5 * pk_lin[k > 1.0][0]


def test_tables_bundle(cosmo_z08):
    c = cosmo_z08
    assert c.scale_factor == pytest.approx(1.0 / 1.8)
    assert c.Ea > 1.0
    assert 0.0 < c.growth < 1.0
    assert 0.5 < c.growth_rate < 1.0
    assert c.chi > 1000.0
    # P_lin(z) = D^2 P_lin(0)
    k = np.logspace(-3, 0, 50)
    ratio = np.asarray(c.pk_lin(k)) / np.asarray(c.pk_lin_z0(k))
    assert np.allclose(ratio, c.growth**2, rtol=1e-6)
    # pk table returns 0 at k=0 (reference nan_to_num convention)
    assert float(c.pk_nl(0.0)) == 0.0
