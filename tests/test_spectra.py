"""Estimators: binned P(k) vs oracle, multipoles, correlation functions."""
import jax
import jax.numpy as jnp
import numpy as np

import oracle
from fastbox_tpu.fields import gaussian
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.ops import spectra

N = 16
GRID = GridSpec.create(box_scale=(1e2, 1e2, 1e2), nsamp=N)


def _field(cosmo, seed=0, grid=GRID):
    key = jax.random.PRNGKey(seed)
    return gaussian.realise_density(key, grid, cosmo, dtype=jnp.float64)


def test_binned_pk_matches_oracle(cosmo_z0):
    dx, dk = _field(cosmo_z0)
    kc_j, pk_j, sd_j = spectra.binned_power_spectrum(GRID, delta_k=dk)
    Kx, Ky, Kz, k = oracle.kgrids(N, GRID.Lx, GRID.Ly, GRID.Lz)
    m = (Kx**2 + Ky**2 + Kz**2).astype(np.int64)
    kc_o, pk_o, sd_o = oracle.binned_power_spectrum(
        np.asarray(dk), k, GRID.kmin, GRID.kmax, GRID.boxfactor,
        index_m=m, kappa=2.0 * np.pi / GRID.Lx
    )
    assert np.allclose(np.asarray(kc_j), kc_o)
    assert np.allclose(np.asarray(pk_j), pk_o, rtol=1e-10, equal_nan=True)
    assert np.allclose(np.asarray(sd_j), sd_o, rtol=1e-6, equal_nan=True)


def test_binned_pk_custom_bins(cosmo_z0):
    dx, dk = _field(cosmo_z0)
    kbins = np.linspace(GRID.kmin, 0.5 * GRID.kmax, 12)
    kc_j, pk_j, _ = spectra.binned_power_spectrum(GRID, delta_k=dk, kbins=kbins)
    Kx, Ky, Kz, k = oracle.kgrids(N, GRID.Lx, GRID.Ly, GRID.Lz)
    m = (Kx**2 + Ky**2 + Kz**2).astype(np.int64)
    kc_o, pk_o, _ = oracle.binned_power_spectrum(
        np.asarray(dk), k, GRID.kmin, GRID.kmax, GRID.boxfactor, kbins=kbins,
        index_m=m, kappa=2.0 * np.pi / GRID.Lx
    )
    assert np.allclose(np.asarray(pk_j), pk_o, rtol=1e-10, equal_nan=True)


def test_recovered_power_matches_input(cosmo_z0):
    # Average over several realisations: binned P(k) ~ input P(k)
    grid = GridSpec.create(box_scale=1e3, nsamp=32)
    pks = []
    for seed in range(6):
        dx, dk = _field(cosmo_z0, seed=seed, grid=grid)
        kc, pk, _ = spectra.binned_power_spectrum(grid, delta_k=dk)
        pks.append(np.asarray(pk))
    kc = np.asarray(kc)
    pk_mean = np.nanmean(pks, axis=0)
    pk_th = np.asarray(cosmo_z0.pk_nl(kc))
    sel = (kc > 2 * grid.kmin) & (kc < 0.3 * grid.kmax) & ~np.isnan(pk_mean)
    ratio = pk_mean[sel] / pk_th[sel]
    assert np.all(np.abs(ratio - 1.0) < 0.35)


def test_power_spectrum_isotropic_multipoles(cosmo_z0):
    dx, _ = _field(cosmo_z0, grid=GridSpec.create(1e3, 32))
    grid = GridSpec.create(1e3, 32)
    res = spectra.power_multipoles(grid, dx, poles=(0, 2, 4))
    p0 = np.asarray(res["power_0"])
    p2 = np.asarray(res["power_2"])
    good = ~np.isnan(p0) & (np.asarray(res["modes"]) > 50)
    # Isotropic field: quadrupole consistent with 0 relative to monopole
    assert np.nanmedian(np.abs(p2[good]) / p0[good]) < 0.5


def test_power_spectrum_cross_equals_auto(cosmo_z0):
    dx, _ = _field(cosmo_z0)
    auto = spectra.power_spectrum(GRID, dx)
    cross = spectra.power_spectrum(GRID, dx, second=dx)
    assert np.allclose(np.asarray(auto["power"]), np.asarray(cross["power"]),
                       equal_nan=True)


def test_power_kmu_shapes(cosmo_z0):
    dx, _ = _field(cosmo_z0)
    res = spectra.power_spectrum(GRID, dx, nmu=5)
    assert res["power"].shape == res["mu"].shape == res["modes"].shape
    assert res["power"].ndim == 2 and res["power"].shape[1] == 5
    mu = np.asarray(res["mu"])
    assert np.nanmin(mu) >= 0.0 and np.nanmax(mu) <= 1.0


def test_correlation_function_consistency(cosmo_z0):
    # xi3d from the estimator equals the direct numpy FFT result
    dx, dk = _field(cosmo_z0)
    res = spectra.correlation_function(GRID, dx, dr=5.0)
    xi3d = np.fft.ifftn(np.abs(np.asarray(dk)) ** 2).real / N**3
    # bin manually
    nx = np.fft.fftfreq(N, 1.0) * N
    dxs = nx * (GRID.Lx / N)
    r = np.sqrt(dxs[:, None, None] ** 2 + dxs[None, :, None] ** 2
                + dxs[None, None, :] ** 2)
    edges = np.asarray(res["r_edges"])
    for i in range(len(edges) - 1):
        sel = (r >= edges[i]) & (r < edges[i + 1])
        if sel.sum() == 0:
            continue
        expect = xi3d[sel].mean()
        got = float(np.asarray(res["corr"])[i])
        assert np.isclose(got, expect, rtol=1e-8, atol=1e-12)


def test_correlation_multipoles_runs(cosmo_z0):
    dx, _ = _field(cosmo_z0)
    res = spectra.correlation_multipoles(GRID, dx, dr=10.0)
    assert "corr_0" in res and "corr_2" in res and "corr_4" in res
    assert np.asarray(res["corr_0"]).shape == np.asarray(res["r"]).shape


def test_multipoles_arbitrary_los_matches_transposed_field(cosmo_z0):
    """P_l along los=x of a field == P_l along los=z of the field with its
    x and z axes swapped (cubic box)."""
    dx, _ = _field(cosmo_z0, seed=5)
    # Make the field anisotropic along z so the quadrupole is nonzero
    aniso = dx * (1.0 + 0.5 * jnp.cos(
        2.0 * jnp.pi * jnp.arange(N)[None, None, :] / N))
    res_z = spectra.power_multipoles(GRID, aniso, los=(0, 0, 1))
    res_x = spectra.power_multipoles(GRID, jnp.transpose(aniso, (2, 1, 0)),
                                     los=(1, 0, 0))
    for ell in (0, 2, 4):
        a = np.asarray(res_z[f"power_{ell}"])
        b = np.asarray(res_x[f"power_{ell}"])
        sel = np.isfinite(a) & np.isfinite(b)
        assert np.allclose(a[sel], b[sel], rtol=1e-10)


def test_pkmu_arbitrary_los(cosmo_z0):
    dx, _ = _field(cosmo_z0, seed=6)
    res_z = spectra.power_spectrum(GRID, dx, nmu=4, los=(0, 0, 1))
    res_y = spectra.power_spectrum(GRID, jnp.transpose(dx, (0, 2, 1)),
                                   nmu=4, los=(0, 1, 0))
    a, b = np.asarray(res_z["power"]), np.asarray(res_y["power"])
    sel = np.isfinite(a) & np.isfinite(b)
    assert np.allclose(a[sel], b[sel], rtol=1e-10)


def test_correlation_multipoles_arbitrary_los(cosmo_z0):
    dx, _ = _field(cosmo_z0, seed=7)
    aniso = dx * (1.0 + 0.5 * jnp.cos(
        2.0 * jnp.pi * jnp.arange(N)[None, None, :] / N))
    res_z = spectra.correlation_multipoles(GRID, aniso, dr=10.0,
                                           los=(0, 0, 1))
    res_x = spectra.correlation_multipoles(
        GRID, jnp.transpose(aniso, (2, 1, 0)), dr=10.0, los=(1, 0, 0))
    for ell in (0, 2, 4):
        a = np.asarray(res_z[f"corr_{ell}"])
        b = np.asarray(res_x[f"corr_{ell}"])
        sel = np.isfinite(a) & np.isfinite(b)
        assert np.allclose(a[sel], b[sel], rtol=1e-9)
