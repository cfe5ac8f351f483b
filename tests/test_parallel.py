"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.parallel import (
    make_mesh,
    make_sharded_ensemble_step,
    pfft2_local,
    pfft3_local,
    pifft3_local,
)
from fastbox_tpu.parallel.fft import pirfft3_local, prfft3_local
from fastbox_tpu.pipeline import PipelineConfig, make_pipeline

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _space_mesh(space=4):
    devs = np.asarray(jax.devices()[:space]).reshape(1, space)
    return Mesh(devs, ("ens", "space"))


def test_pfft3_matches_fftn():
    mesh = _space_mesh(4)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 16)) + 1j * rng.standard_normal((2, 16, 16, 16))

    f = shard_map(lambda a: pfft3_local(a, "space"), mesh=mesh,
                  in_specs=P(None, "space"), out_specs=P(None, "space"),
                  check_vma=False)
    got = np.asarray(jax.jit(f)(jnp.asarray(x)))
    want = np.fft.fftn(x, axes=(1, 2, 3))
    assert np.allclose(got, want, rtol=1e-9, atol=1e-9)


def test_pifft3_roundtrip():
    mesh = _space_mesh(4)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 16, 16, 16)) + 0j

    f = shard_map(lambda a: pifft3_local(pfft3_local(a, "space"), "space"),
                  mesh=mesh, in_specs=P(None, "space"),
                  out_specs=P(None, "space"), check_vma=False)
    got = np.asarray(jax.jit(f)(jnp.asarray(x)))
    assert np.allclose(got, x, rtol=1e-9, atol=1e-9)


def test_prfft3_matches_rfftn():
    mesh = _space_mesh(4)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 16, 16, 16))

    f = shard_map(lambda a: prfft3_local(a, "space"), mesh=mesh,
                  in_specs=P(None, "space"), out_specs=P(None, "space"),
                  check_vma=False)
    got = np.asarray(jax.jit(f)(jnp.asarray(x)))
    want = np.fft.rfftn(x, axes=(1, 2, 3))
    assert got.shape == want.shape
    assert np.allclose(got, want, rtol=1e-9, atol=1e-9)


def test_pirfft3_roundtrip():
    mesh = _space_mesh(4)
    rng = np.random.default_rng(8)
    x = rng.standard_normal((1, 16, 16, 16))

    f = shard_map(
        lambda a: pirfft3_local(prfft3_local(a, "space"), 16, "space"),
        mesh=mesh, in_specs=P(None, "space"), out_specs=P(None, "space"),
        check_vma=False)
    got = np.asarray(jax.jit(f)(jnp.asarray(x)))
    assert np.allclose(got, x, rtol=1e-9, atol=1e-9)


def test_pfft2_matches_fft2():
    mesh = _space_mesh(4)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 16, 16)) + 1j * rng.standard_normal((3, 16, 16))

    f = shard_map(lambda a: pfft2_local(a, "space"), mesh=mesh,
                  in_specs=P(None, "space"), out_specs=P(None, "space"),
                  check_vma=False)
    got = np.asarray(jax.jit(f)(jnp.asarray(x)))
    want = np.fft.fftn(x, axes=(1, 2))
    assert np.allclose(got, want, rtol=1e-9, atol=1e-9)


def test_sharded_ensemble_step_runs(cosmo_z08):
    grid = GridSpec.create(box_scale=(1e3, 1e3, 1e3), nsamp=16, redshift=0.8)
    mesh = make_mesh(8, space=4, grid_n=16)
    config = PipelineConfig(dtype="float64", nbins=8)
    step = make_sharded_ensemble_step(mesh, grid, cosmo_z08, config)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)  # B=4, ens=2
    out = step(keys)
    pk = np.asarray(out["pk_cleaned"])
    assert pk.shape[0] == 4
    assert np.all(np.isfinite(pk[:, 1:-2]))


def test_sharded_matches_single_chip_statistics(cosmo_z08):
    """Sharded and single-chip pipelines must produce statistically
    consistent cleaned spectra (they use different RNG partitions)."""
    grid = GridSpec.create(box_scale=(2e3, 2e3, 2e3), nsamp=16, redshift=0.8)
    config = PipelineConfig(dtype="float64", nbins=8, sigma_nl=0.0)

    mesh = make_mesh(8, space=4, grid_n=16)
    step = make_sharded_ensemble_step(mesh, grid, cosmo_z08, config)
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    pk_sharded = np.asarray(step(keys)["pk_cleaned"])

    single = make_pipeline(grid, cosmo_z08, config)
    pk_single = np.stack([np.asarray(single(k)["pk_cleaned"]) for k in keys])

    m_sh = np.nanmean(pk_sharded, axis=0)
    m_si = np.nanmean(pk_single, axis=0)
    sel = np.isfinite(m_sh) & np.isfinite(m_si) & (m_si > 0)
    ratio = m_sh[sel] / m_si[sel]
    # Same physics, different noise draws: agree to within sampling scatter
    assert np.all(ratio > 0.4) and np.all(ratio < 2.5)


def test_sharded_equals_single_chip_rows_scheme(cosmo_z08):
    """EXACT parity: with the mesh-independent row-keyed noise scheme, the
    sharded step and the single-device pipeline must agree on the same keys
    to f64 tolerance, with every config field honored (beam, kpar_min,
    sigma_nl, rsd_method, pca_exact)."""
    grid = GridSpec.create(box_scale=(1e3, 1e3, 1e3), nsamp=16, redshift=0.8)
    config = PipelineConfig(dtype="float64", nbins=8, noise_scheme="rows",
                            sigma_nl=120.0, beam_dish_m=13.5, kpar_min=0.02,
                            pca_nmodes=3)
    mesh = make_mesh(8, space=4, grid_n=16)
    step = make_sharded_ensemble_step(mesh, grid, cosmo_z08, config)
    keys = jax.random.split(jax.random.PRNGKey(5), 2)   # B=2 over ens=2
    out_sh = step(keys)

    single = make_pipeline(grid, cosmo_z08, config)
    for i, k in enumerate(keys):
        out_si = single(k)
        for name in ("pk_cleaned", "pk_cleaned_err", "pk_density"):
            a = np.asarray(out_sh[name])[i]
            b = np.asarray(out_si[name])
            np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-12,
                                       equal_nan=True, err_msg=name)
        assert np.isclose(float(np.asarray(out_sh["sigma_data"])[i]),
                          float(np.asarray(out_si["sigma_data"])),
                          rtol=1e-9)


def test_sharded_equals_single_chip_alt_config(cosmo_z08):
    """Same parity under the other config corners: nearest-neighbour RSD,
    subspace PCA, foregrounds/noise off."""
    grid = GridSpec.create(box_scale=(1e3, 1e3, 1e3), nsamp=16, redshift=0.8)
    config = PipelineConfig(dtype="float64", nbins=8, noise_scheme="rows",
                            sigma_nl=0.0, rsd_method="nearest",
                            pca_exact=False, include_foregrounds=False,
                            include_noise=False, pca_nmodes=2)
    mesh = make_mesh(8, space=4, grid_n=16)
    step = make_sharded_ensemble_step(mesh, grid, cosmo_z08, config)
    keys = jax.random.split(jax.random.PRNGKey(9), 2)
    out_sh = step(keys)

    single = make_pipeline(grid, cosmo_z08, config)
    out_si = single(keys[0])
    np.testing.assert_allclose(np.asarray(out_sh["pk_cleaned"])[0],
                               np.asarray(out_si["pk_cleaned"]),
                               rtol=1e-7, atol=1e-12, equal_nan=True)


def test_sharded_rows_scheme_mesh_independent(cosmo_z08):
    """The row-keyed draws make results independent of the space factor."""
    grid = GridSpec.create(box_scale=(1e3, 1e3, 1e3), nsamp=16, redshift=0.8)
    config = PipelineConfig(dtype="float64", nbins=8, noise_scheme="rows")
    keys = jax.random.split(jax.random.PRNGKey(2), 2)

    outs = []
    for space in (2, 4):
        mesh = make_mesh(space * 1, space=space, grid_n=16)
        step = make_sharded_ensemble_step(mesh, grid, cosmo_z08, config)
        outs.append(np.asarray(step(keys)["pk_cleaned"]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-8, atol=1e-12,
                               equal_nan=True)


def test_row_normal_box_muller_stream():
    """The memory-lean Box-Muller rows draw (the >=1024^3 default,
    parallel/rng.py): exact-N(0,1) statistics, determinism, and the same
    mesh-shape-independence contract as the erfinv stream (a slab's rows
    depend only on (key, tag, global row index))."""
    import jax.numpy as jnp

    from fastbox_tpu.parallel.rng import row_normal

    key = jax.random.PRNGKey(7)
    full = np.asarray(row_normal(key, 1, 0, 8, (64, 64), jnp.float64,
                                 "box_muller"))
    lo = np.asarray(row_normal(key, 1, 0, 4, (64, 64), jnp.float64,
                               "box_muller"))
    hi = np.asarray(row_normal(key, 1, 4, 4, (64, 64), jnp.float64,
                               "box_muller"))
    np.testing.assert_array_equal(full, np.concatenate([lo, hi], axis=0))

    n = full.size
    assert abs(full.mean()) < 5.0 / np.sqrt(n)
    assert abs(full.std() - 1.0) < 0.02
    assert abs(np.mean(full**3)) < 0.05
    assert abs(np.mean(full**4) - 3.0) < 0.2
    # cos and sin halves of each pair must be independent
    a, b = full[..., :32].ravel(), full[..., 32:].ravel()
    assert abs(np.corrcoef(a, b)[0, 1]) < 5.0 / np.sqrt(a.size)
    # different stream than erfinv, deterministic per key
    erf = np.asarray(row_normal(key, 1, 0, 8, (64, 64), jnp.float64))
    assert not np.allclose(full, erf)
    again = np.asarray(row_normal(key, 1, 0, 8, (64, 64), jnp.float64,
                                  "box_muller"))
    np.testing.assert_array_equal(full, again)
    # odd trailing axis exercises the no-pairing fallback
    odd = np.asarray(row_normal(key, 1, 0, 4, (63,), jnp.float64,
                                "box_muller"))
    assert odd.shape == (4, 63) and np.isfinite(odd).all()
