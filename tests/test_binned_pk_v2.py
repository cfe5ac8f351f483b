"""binned_pk v2 (hoisted counts / telescoped digitize) vs the v1 kernel.

v2's plain mode must be BIT-IDENTICAL to v1 on s1/q1/s2 (same masked
summation order, count pass merely dropped).  The telescoped mode
changes the order (prefix differences) and must stay within a few ULP
of v1 on uniformly-scaled inputs.
"""
import jax.numpy as jnp
import numpy as np

from fastbox_tpu.ops.pallas.binned_pk import binned_pk_half_dual_pallas
from fastbox_tpu.ops.pallas.binned_pk_v2 import binned_pk_half_dual_pallas_v2


def _setup(rng, N=16):
    H = N // 2 + 1
    p1 = jnp.asarray(rng.uniform(0.1, 5.0, (N, N, H)).astype(np.float32))
    p2 = jnp.asarray(rng.uniform(0.1, 5.0, (N, N, H)).astype(np.float32))
    kx2 = jnp.asarray((np.fft.fftfreq(N) * N) ** 2, jnp.float32)
    kz2 = jnp.asarray(np.arange(H, dtype=np.float64) ** 2, jnp.float32)
    wz = jnp.asarray(np.where((np.arange(H) == 0) | (np.arange(H) == H - 1),
                              1.0, 2.0), jnp.float32)
    edges = jnp.asarray(np.linspace(1.0, 150.0, 12), jnp.float32)
    return p1, p2, kx2, kz2, wz, edges


def test_v2_plain_bit_identical(rng):
    p1, p2, kx2, kz2, wz, edges = _setup(rng)
    a = binned_pk_half_dual_pallas(p1, p2, kx2, kx2, kz2, wz, edges,
                                   interpret=True)
    v = binned_pk_half_dual_pallas_v2(p1, p2, kx2, kx2, kz2, wz, edges,
                                      interpret=True)
    for i in range(3):
        assert np.array_equal(np.asarray(a[i]), np.asarray(v[i])), i


def test_v2_telescoped_close(rng):
    p1, p2, kx2, kz2, wz, edges = _setup(rng)
    a = binned_pk_half_dual_pallas(p1, p2, kx2, kx2, kz2, wz, edges,
                                   interpret=True)
    t = binned_pk_half_dual_pallas_v2(p1, p2, kx2, kx2, kz2, wz, edges,
                                      telescoped=True, interpret=True)
    for i in range(3):
        x, z = np.asarray(a[i]), np.asarray(t[i])
        rel = np.max(np.abs(z - x) / np.maximum(np.abs(x), 1e-20))
        assert rel < 2e-5, (i, rel)


def test_v2_oracle_f64(rng):
    """v2 against a pure-numpy f64 oracle of the same classification."""
    p1, p2, kx2, kz2, wz, edges = _setup(rng)
    v = binned_pk_half_dual_pallas_v2(p1, p2, kx2, kx2, kz2, wz, edges,
                                      interpret=True)
    k2 = (np.asarray(kx2)[:, None, None] + np.asarray(kx2)[None, :, None]
          + np.asarray(kz2)[None, None, :])
    idx = (np.asarray(edges)[None, None, None, :] <= k2[..., None]).sum(-1)
    w = np.broadcast_to(np.asarray(wz)[None, None, :], k2.shape)
    for b in range(edges.shape[0]):
        m = idx == b
        np.testing.assert_allclose(
            float(v[0][b]), (w * np.asarray(p1, np.float64))[m].sum(),
            rtol=1e-5)
        np.testing.assert_allclose(
            float(v[2][b]), (w * np.asarray(p2, np.float64))[m].sum(),
            rtol=1e-5)
