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

    # Squared-space contract (round 4): the kernel digitizes k^2
    # against squared edges
    s_p, q_p, c_p = binned_pk_pallas(pk3d, kx**2, ky**2, kz**2, edges**2,
                                     interpret=True)

    k2 = (kx[:, None, None] ** 2 + ky[None, :, None] ** 2
          + kz[None, None, :] ** 2)
    idx = jnp.searchsorted(edges**2, k2.ravel(), side="right")
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
        p1, p2, kx**2, ky**2, kzh**2, jnp.asarray(wz), edges**2,
        interpret=True)

    k2 = (kx[:, None, None] ** 2 + ky[None, :, None] ** 2
          + kzh[None, None, :] ** 2)
    idx = jnp.searchsorted(edges**2, k2.ravel(),
                           side="right").astype(jnp.int32)
    w = jnp.broadcast_to(jnp.asarray(wz)[None, None, :], p1.shape)
    s1r, q1r, s2r, _, cwr = binned_weighted_dual(
        p1.ravel(), p2.ravel(), w.ravel(), idx, 20)

    assert np.allclose(np.asarray(cwp), np.asarray(cwr))
    assert np.allclose(np.asarray(s1p), np.asarray(s1r), rtol=1e-5)
    assert np.allclose(np.asarray(q1p), np.asarray(q1r), rtol=1e-5)
    assert np.allclose(np.asarray(s2p), np.asarray(s2r), rtol=1e-5)


def test_binned_pk_half_dual_pallas_lane_chunked(rng, monkeypatch):
    """The lane-chunked (2D-grid) dual kernel matches the unchunked one.

    At 512^3 a full-row (8, Ny*H) block overflows the 16 MB scoped-vmem
    limit, so the kernel splits the lane dim into 128-multiple chunks.
    Exercise that path at a small size by shrinking the block budget:
    (16, 128, 65) rows are 8320 lanes (a multiple of 128), and a 100 KB
    budget forces nc=5 chunks of 1664 lanes.  The budget is read at
    trace time, so the chunked call must use a fresh shape (it does:
    no other test uses Ny=128)."""
    from fastbox_tpu.ops.pallas import binned_pk as bpk

    Nx, Ny, H = 16, 128, 65
    p1 = jnp.asarray(rng.random((Nx, Ny, H)), dtype=jnp.float32)
    p2 = jnp.asarray(rng.random((Nx, Ny, H)), dtype=jnp.float32)
    kx2 = jnp.asarray(rng.random(Nx), dtype=jnp.float32)
    ky2 = jnp.asarray(rng.random(Ny), dtype=jnp.float32)
    kz2h = jnp.asarray(rng.random(H), dtype=jnp.float32)
    wz = np.full(H, 2.0, dtype=np.float32)
    wz[0] = 1.0
    wz[-1] = 1.0
    edges = jnp.asarray(np.linspace(0.05, 1.6, 12), dtype=jnp.float32)
    args = (p1, p2, kx2, ky2, kz2h, jnp.asarray(wz), edges)

    base = bpk.binned_pk_half_dual_pallas(*args, interpret=True)

    monkeypatch.setattr(bpk, "_VMEM_BLOCK_BUDGET", 100_000)
    jax.clear_caches()  # the budget is read at trace time
    chunked = bpk.binned_pk_half_dual_pallas(*args, interpret=True)
    jax.clear_caches()  # don't leak the shrunken-budget trace

    for a, b in zip(chunked, base):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_binned_pk_half_dual_pallas_lane_padded(rng, monkeypatch):
    """The zero-weight lane-pad path (N not a multiple of 128) matches.

    At 576^3 the (8, Ny*H) row block is 5.3 MB — over the scoped-VMEM
    budget — and Ny*H = 576*289 is NOT a 128-multiple, so no lane chunk
    exists: that configuration compile-OOMed in the round-3 campaign-J
    probes (docs/scaling.md).  The fix pads H to a lane multiple with
    ZERO multiplicity weight (every accumulated sum carries w, so padded
    elements contribute exactly 0) and then chunks.  Exercise it small:
    (16, 72, 37) rows are 2664 lanes (not a 128-multiple) and a 100 KB
    budget forces the pad + chunk path for both v1 and v2."""
    from fastbox_tpu.ops.pallas import binned_pk as bpk
    from fastbox_tpu.ops.pallas import binned_pk_v2 as bpk2

    Nx, Ny, H = 16, 72, 37
    p1 = jnp.asarray(rng.random((Nx, Ny, H)), dtype=jnp.float32)
    p2 = jnp.asarray(rng.random((Nx, Ny, H)), dtype=jnp.float32)
    kx2 = jnp.asarray(rng.random(Nx), dtype=jnp.float32)
    ky2 = jnp.asarray(rng.random(Ny), dtype=jnp.float32)
    kz2h = jnp.asarray(rng.random(H), dtype=jnp.float32)
    wz = np.full(H, 2.0, dtype=np.float32)
    wz[0] = 1.0
    wz[-1] = 1.0
    edges = jnp.asarray(np.linspace(0.05, 1.6, 12), dtype=jnp.float32)
    args = (p1, p2, kx2, ky2, kz2h, jnp.asarray(wz), edges)

    base = bpk.binned_pk_half_dual_pallas(*args, interpret=True)
    base2 = bpk2.binned_pk_half_dual_pallas_v2(*args, interpret=True)

    monkeypatch.setattr(bpk, "_VMEM_BLOCK_BUDGET", 100_000)
    jax.clear_caches()
    padded = bpk.binned_pk_half_dual_pallas(*args, interpret=True)
    padded2 = bpk2.binned_pk_half_dual_pallas_v2(*args, interpret=True)
    jax.clear_caches()

    for a, b in zip(padded, base):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
    for a, b in zip(padded2, base2):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


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
