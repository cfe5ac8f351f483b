"""Native C++ cosmology kernels vs the pure-Python implementations."""
import numpy as np
import pytest

from fastbox_tpu import native
from fastbox_tpu.cosmology import CosmoParams, background as bg, eisenstein_hu as eh
from fastbox_tpu.cosmology.halofit import _sigma2_moments

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

COSMO = CosmoParams()


def test_eh98_transfer_matches_python():
    k = np.logspace(-4, 2, 300)
    got = native.eh98_transfer(COSMO, k)
    want = eh.transfer_eh98(COSMO, k)
    assert np.allclose(got, want, rtol=1e-12)


def test_growth_tables_match_python():
    a_n, D_n, f_n = native.growth_tables(COSMO, 1e-3, 512)
    a_p, D_p, f_p = bg.growth_tables(COSMO, 1e-3, 512)
    assert np.allclose(a_n, a_p, rtol=1e-12)
    assert np.allclose(D_n, D_p, rtol=1e-6)
    assert np.allclose(f_n, f_p, rtol=1e-6)


def test_comoving_distance_matches_python():
    for z in (0.1, 0.8, 2.0):
        got = native.comoving_distance(COSMO, 1.0 / (1.0 + z))
        want = bg.comoving_radial_distance(COSMO, 1.0 / (1.0 + z))
        assert np.isclose(got, want, rtol=1e-6), z


def test_sigma2_moments_match_python():
    k = np.logspace(-5, 3, 2048)
    pk = eh.linear_power_z0(COSMO, k)
    lnk, lnp = np.log(k), np.log(np.maximum(pk, 1e-300))
    itp = lambda x: np.interp(x, lnk, lnp)
    for R in (1.0, 4.0, 12.0):
        s_n = native.sigma2_gauss_moments(lnk, lnp, R)
        s_p = _sigma2_moments(itp, R)
        assert np.isclose(s_n[0], s_p[0], rtol=1e-4), R
        assert np.isclose(s_n[1], s_p[1], rtol=1e-3), R
        assert np.isclose(s_n[2], s_p[2], rtol=1e-2, atol=1e-3), R


def test_sigma_tophat_matches_python():
    got = native.sigma_tophat_eh98(COSMO, 8.0 / COSMO.h)
    want = eh.sigma_r_unnorm(COSMO, 8.0 / COSMO.h)
    assert np.isclose(got, want, rtol=1e-5)
