"""Field realisation engine vs the numpy oracle on matched white noise."""
import jax
import jax.numpy as jnp
import numpy as np

import oracle
from fastbox_tpu.fields import gaussian
from fastbox_tpu.grid import GridSpec

N = 16
GRID = GridSpec.create(box_scale=(1e2, 2e2, 3e2), nsamp=N, redshift=0.0)


def _white(rng):
    return (rng.standard_normal(GRID.shape)
            + 1j * rng.standard_normal(GRID.shape))


def test_gaussian_field_matches_oracle(cosmo_z0, rng):
    white = _white(rng)
    _, _, _, k = oracle.kgrids(N, GRID.Lx, GRID.Ly, GRID.Lz)
    pk_grid = np.asarray(cosmo_z0.pk_nl(k))
    dx_o, dk_o = oracle.gaussian_field(white, pk_grid, GRID.boxfactor)

    dx_j, dk_j = gaussian.gaussian_field_from_whitenoise(
        jnp.asarray(white), GRID, cosmo_z0.pk_nl
    )
    assert np.allclose(np.asarray(dx_j), dx_o, rtol=1e-10, atol=1e-12)
    assert np.allclose(np.asarray(dk_j), dk_o, rtol=1e-10, atol=1e-9)


def test_parseval(cosmo_z0, rng):
    white = _white(rng)
    dx, dk = gaussian.gaussian_field_from_whitenoise(
        jnp.asarray(white), GRID, cosmo_z0.pk_nl
    )
    s1 = float(jnp.sum(dx**2) * N**3)
    s2 = float(jnp.sum(dk * jnp.conj(dk)).real)
    assert np.isclose(s1, s2)


def test_velocity_matches_oracle(cosmo_z0, rng):
    white = _white(rng)
    _, dk = gaussian.gaussian_field_from_whitenoise(
        jnp.asarray(white), GRID, cosmo_z0.pk_nl
    )
    fac = (100.0 * cosmo_z0.h * cosmo_z0.Ea * cosmo_z0.growth_rate
           * cosmo_z0.scale_factor)
    vx_o, vy_o, vz_o = oracle.velocity_field(
        np.asarray(dk), N, GRID.Lx, GRID.Ly, GRID.Lz, fac
    )
    v = gaussian.realise_velocity(dk, GRID, cosmo_z0)
    assert np.allclose(np.asarray(v[0]), vx_o, rtol=1e-10, atol=1e-10)
    assert np.allclose(np.asarray(v[1]), vy_o, rtol=1e-10, atol=1e-10)
    assert np.allclose(np.asarray(v[2]), vz_o, rtol=1e-10, atol=1e-10)
    # Real-space velocity must be (numerically) real
    vreal = jnp.fft.ifftn(v[2])
    assert float(jnp.max(jnp.abs(vreal.imag))) < 1e-8


def test_potential(cosmo_z0, rng):
    white = _white(rng)
    _, dk = gaussian.gaussian_field_from_whitenoise(
        jnp.asarray(white), GRID, cosmo_z0.pk_nl
    )
    phi = gaussian.realise_potential(dk, GRID, cosmo_z0)
    _, _, _, k = oracle.kgrids(N, GRID.Lx, GRID.Ly, GRID.Lz)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi_o = np.asarray(dk) / k**2
    phi_o[0, 0, 0] = 0.0
    assert np.allclose(np.asarray(phi), phi_o, rtol=1e-10, atol=1e-10)


def test_seeded_reproducibility(cosmo_z0):
    key = jax.random.PRNGKey(3)
    dx1, _ = gaussian.realise_density(key, GRID, cosmo_z0, dtype=jnp.float64)
    dx2, _ = gaussian.realise_density(key, GRID, cosmo_z0, dtype=jnp.float64)
    assert np.array_equal(np.asarray(dx1), np.asarray(dx2))
    dx3, _ = gaussian.realise_density(jax.random.PRNGKey(4), GRID, cosmo_z0,
                                      dtype=jnp.float64)
    assert not np.allclose(np.asarray(dx1), np.asarray(dx3))


def test_hermitian_half_noise_statistics(cosmo_z0):
    """Direct half-spectrum draw must reproduce the full-draw field
    statistics: unit white-noise variance and Hermitian consistency."""
    grid = GridSpec.create(box_scale=1e3, nsamp=32)
    H = 32 // 2 + 1
    vars_ = []
    for seed in range(6):
        half = gaussian.hermitian_half_noise(jax.random.PRNGKey(seed), grid,
                                             jnp.float64)
        # Round trip: irfftn then rfftn must reproduce the half spectrum
        x = jnp.fft.irfftn(half, s=grid.shape)
        back = jnp.fft.rfftn(x)
        assert np.allclose(np.asarray(back), np.asarray(half), atol=1e-10)
        # Unit-variance white noise: var(x) * N^3 == 1 (Parseval)
        vars_.append(float(jnp.var(x)) * 32**3)
    assert np.isclose(np.mean(vars_), 1.0, rtol=0.05)


def test_hermitian_half_noise_box_muller(cosmo_z0):
    """The box_muller draw method (PipelineConfig.draw_method): identical
    statistics contract to the erfinv stream (Hermitian round trip + unit
    Parseval variance + CN(0,1) interior moments), deterministic per key,
    and a genuinely different stream than erfinv."""
    grid = GridSpec.create(box_scale=1e3, nsamp=32)
    vars_, res, ims = [], [], []
    for seed in range(6):
        half = gaussian.hermitian_half_noise(jax.random.PRNGKey(seed), grid,
                                             jnp.float64,
                                             method="box_muller")
        x = jnp.fft.irfftn(half, s=grid.shape)
        back = jnp.fft.rfftn(x)
        assert np.allclose(np.asarray(back), np.asarray(half), atol=1e-10)
        vars_.append(float(jnp.var(x)) * 32**3)
        interior = np.asarray(half[:, :, 1:16])
        res.append(interior.real.ravel())
        ims.append(interior.imag.ravel())
    assert np.isclose(np.mean(vars_), 1.0, rtol=0.05)
    re = np.concatenate(res)
    im = np.concatenate(ims)
    # interior modes: independent parts of variance 1/2 each
    for part in (re, im):
        assert abs(part.mean()) < 5.0 / np.sqrt(part.size)
        assert np.isclose(part.std(), np.sqrt(0.5), rtol=0.02)
    assert abs(np.corrcoef(re, im)[0, 1]) < 5.0 / np.sqrt(re.size)
    # deterministic per key; distinct stream from erfinv
    a = gaussian.hermitian_half_noise(jax.random.PRNGKey(3), grid,
                                      jnp.float64, method="box_muller")
    b = gaussian.hermitian_half_noise(jax.random.PRNGKey(3), grid,
                                      jnp.float64, method="box_muller")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    e = gaussian.hermitian_half_noise(jax.random.PRNGKey(3), grid,
                                      jnp.float64)
    assert not np.allclose(np.asarray(a), np.asarray(e))


def test_pipeline_draw_method_pk_statistics(cosmo_z0):
    """The full pipeline with draw_method='box_muller' produces the same
    binned density P(k) statistics as the erfinv stream (different
    realisations, same ensemble)."""
    from fastbox_tpu.pipeline import PipelineConfig, make_pipeline

    grid = GridSpec.create(box_scale=1e3, nsamp=32)
    pks = {}
    for m in ("erfinv", "box_muller"):
        cfg = PipelineConfig(dtype="float64", include_foregrounds=False,
                             include_noise=False, draw_method=m)
        fn = make_pipeline(grid, cosmo_z0, cfg)
        outs = [np.asarray(fn(jax.random.PRNGKey(s))["pk_density"])
                for s in range(8)]
        pks[m] = np.nanmean(outs, axis=0)
    good = np.isfinite(pks["erfinv"]) & np.isfinite(pks["box_muller"]) \
        & (pks["erfinv"] > 0)
    rel = np.abs(pks["box_muller"][good] - pks["erfinv"][good]) \
        / pks["erfinv"][good]
    # 8 realisations of a 32^3 box: broadband agreement at the
    # sample-variance level
    assert np.median(rel) < 0.25


def test_field_statistics(cosmo_z0):
    # Variance of the realised field should match sum P(k) boxfactor / N^6
    grid = GridSpec.create(box_scale=1e3, nsamp=32)
    _, _, _, k = oracle.kgrids(32, 1e3, 1e3, 1e3)
    pk = np.asarray(cosmo_z0.pk_nl(k))
    expected_var = np.sum(pk) / 1e3**3  # sum P / V
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    vs = []
    for kk in keys:
        dx, _ = gaussian.realise_density(kk, grid, cosmo_z0, dtype=jnp.float64)
        vs.append(float(jnp.var(dx)))
    mean_var = np.mean(vs)
    assert np.isclose(mean_var, expected_var, rtol=0.2)
