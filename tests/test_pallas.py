"""Pallas kernels in interpreter mode vs the XLA reference path."""
import jax
import jax.numpy as jnp
import numpy as np

from fastbox_tpu.grid import GridSpec
from fastbox_tpu.ops.pallas.binned_pk import binned_pk_pallas
from fastbox_tpu.ops.reduce import binned_sum_sumsq_count


def test_binned_pk_pallas_matches_reference(rng):
    N = 16
    grid = GridSpec.create(box_scale=(1e2, 2e2, 3e2), nsamp=N)
    pk3d = jnp.asarray(rng.random((N, N, N)), dtype=jnp.float32)
    kx, ky, kz = grid.kvec(jnp.float32)
    edges = jnp.asarray(
        np.logspace(np.log10(grid.kmin), np.log10(grid.kmax), 20),
        dtype=jnp.float32)

    s_p, q_p, c_p = binned_pk_pallas(pk3d, kx**2, ky**2, kz**2, edges,
                                     interpret=True)

    kmag = grid.kmag(jnp.float32)
    idx = jnp.searchsorted(edges, kmag.ravel(), side="right")
    s_r, q_r, c_r = binned_sum_sumsq_count(pk3d.ravel(), idx, 20)

    assert np.allclose(np.asarray(c_p), np.asarray(c_r))
    assert np.allclose(np.asarray(s_p), np.asarray(s_r), rtol=1e-5)
    assert np.allclose(np.asarray(q_p), np.asarray(q_r), rtol=1e-5)


def test_binned_pk_half_dual_pallas_matches_reference(rng):
    """Weighted dual-field half-spectrum kernel vs the XLA one-hot path."""
    from fastbox_tpu.ops.pallas.binned_pk import binned_pk_half_dual_pallas
    from fastbox_tpu.ops.reduce import binned_weighted_dual

    N = 16
    H = N // 2 + 1
    grid = GridSpec.create(box_scale=(1e2, 2e2, 3e2), nsamp=N)
    p1 = jnp.asarray(rng.random((N, N, H)), dtype=jnp.float32)
    p2 = jnp.asarray(rng.random((N, N, H)), dtype=jnp.float32)
    kx, ky, kz = grid.kvec(jnp.float32)
    kzh = kz[:H]
    wz = np.full(H, 2.0, dtype=np.float32)
    wz[0] = 1.0
    wz[-1] = 1.0
    edges = jnp.asarray(
        np.logspace(np.log10(grid.kmin), np.log10(grid.kmax), 20),
        dtype=jnp.float32)

    s1p, q1p, s2p, cwp = binned_pk_half_dual_pallas(
        p1, p2, kx**2, ky**2, kzh**2, jnp.asarray(wz), edges,
        interpret=True)

    kmag = jnp.sqrt(kx[:, None, None] ** 2 + ky[None, :, None] ** 2
                    + kzh[None, None, :] ** 2)
    idx = jnp.searchsorted(edges, kmag.ravel(),
                           side="right").astype(jnp.int32)
    w = jnp.broadcast_to(jnp.asarray(wz)[None, None, :], p1.shape)
    s1r, q1r, s2r, _, cwr = binned_weighted_dual(
        p1.ravel(), p2.ravel(), w.ravel(), idx, 20)

    assert np.allclose(np.asarray(cwp), np.asarray(cwr))
    assert np.allclose(np.asarray(s1p), np.asarray(s1r), rtol=1e-5)
    assert np.allclose(np.asarray(q1p), np.asarray(q1r), rtol=1e-5)
    assert np.allclose(np.asarray(s2p), np.asarray(s2r), rtol=1e-5)


def test_pipeline_pallas_pk_matches_xla_path():
    """pallas_pk='on' (interpreter on CPU) == the default XLA reduction."""
    from fastbox_tpu.cosmology import build_cosmology
    from fastbox_tpu.pipeline import PipelineConfig, make_pipeline

    grid = GridSpec.create(box_scale=(1e3,) * 3, nsamp=16, redshift=0.8)
    cosmo = build_cosmology(dict(Omega_c=0.25, Omega_b=0.05, h=0.7,
                                 n_s=0.95, sigma8=0.8), redshift=0.8)
    key = jax.random.PRNGKey(11)
    out_x = make_pipeline(grid, cosmo,
                          PipelineConfig(dtype="float32",
                                         pallas_pk="off"))(key)
    out_p = make_pipeline(grid, cosmo,
                          PipelineConfig(dtype="float32",
                                         pallas_pk="on"))(key)
    for name in ("pk_cleaned", "pk_cleaned_err", "pk_density"):
        a, b = np.asarray(out_x[name]), np.asarray(out_p[name])
        mask = np.isfinite(a)
        assert (mask == np.isfinite(b)).all()
        np.testing.assert_allclose(b[mask], a[mask], rtol=2e-5)
