"""Pallas RSD interpolation kernel (interpreter mode) vs the XLA path."""
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fastbox_tpu.ops.pallas.rsd_interp import interp_sorted_pallas
from fastbox_tpu.ops.rsd import remap_los_batched


def test_interp_sorted_pallas_matches_xla(rng):
    M, C = 256, 32
    s = jnp.asarray(rng.random((M, C)) * 100.0, dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((M, C)), dtype=jnp.float32)
    z = jnp.linspace(0.0, 100.0, C, dtype=jnp.float32)
    fill = jnp.asarray(rng.standard_normal(M), dtype=jnp.float32)

    ss, vv = lax.sort_key_val(s, v)
    got = np.asarray(interp_sorted_pallas(ss, vv, z, fill, interpret=True))
    want = np.asarray(remap_los_batched(v, s, z, fill, "linear"))
    assert np.allclose(got, want, atol=1e-5)


def test_interp_sorted_pallas_hull_fill(rng):
    # Targets outside [min(s), max(s)] must return the fill value
    M, C = 128, 16
    s = jnp.asarray(40.0 + rng.random((M, C)) * 20.0, dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((M, C)), dtype=jnp.float32)
    z = jnp.linspace(0.0, 100.0, 32, dtype=jnp.float32)
    fill = jnp.full((M,), 7.5, dtype=jnp.float32)

    ss, vv = lax.sort_key_val(s, v)
    out = np.asarray(interp_sorted_pallas(ss, vv, z, fill, interpret=True))
    zn = np.asarray(z)
    outside = (zn[None, :] < np.asarray(ss[:, :1])) | \
              (zn[None, :] > np.asarray(ss[:, -1:]))
    assert np.all(out[outside] == 7.5)
    assert np.any(~outside)


def test_banded_interp_pallas_matches_jnp(rng):
    """Interpret-mode kernel vs the jnp banded reference, incl. hull fill."""
    from jax import lax
    from fastbox_tpu.ops.pallas.banded_interp import banded_interp_pallas
    from fastbox_tpu.ops.rsd import _interp_sorted_banded

    M, C, w = 256, 128, 4
    zt = np.linspace(0.0, 127.0, C)
    dz = zt[1] - zt[0]
    s = zt[None, :] + rng.uniform(-w * dz * 0.9, w * dz * 0.9, size=(M, C))
    v = rng.standard_normal((M, C))
    fill = rng.standard_normal(M)
    ss, vv = lax.sort_key_val(jnp.asarray(s), jnp.asarray(v))

    got = np.asarray(banded_interp_pallas(ss, vv, jnp.asarray(zt),
                                          jnp.asarray(fill), band=w,
                                          interpret=True))
    ref = np.asarray(_interp_sorted_banded(ss, vv, jnp.asarray(zt), w))
    inside = ((zt[None, :] >= np.asarray(ss)[:, :1])
              & (zt[None, :] <= np.asarray(ss)[:, -1:]))
    ref = np.where(inside, ref, fill[:, None])
    assert np.allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_banded_interp_pallas_duplicate_nodes():
    from jax import lax
    from fastbox_tpu.ops.pallas.banded_interp import banded_interp_pallas
    from fastbox_tpu.ops.rsd import remap_los_batched

    M, C = 8, 128
    zt = np.arange(C, dtype=np.float64)
    s = np.tile(zt, (M, 1))
    s[:, 10] = s[:, 11]  # duplicate node -> step transition
    v = np.random.default_rng(0).standard_normal((M, C))
    fill = np.zeros(M)
    ss, vv = lax.sort_key_val(jnp.asarray(s), jnp.asarray(v))
    got = np.asarray(banded_interp_pallas(ss, vv, jnp.asarray(zt),
                                          jnp.asarray(fill), band=4,
                                          interpret=True))
    want = np.asarray(remap_los_batched(jnp.asarray(v), jnp.asarray(s),
                                        jnp.asarray(zt), jnp.asarray(fill),
                                        band=0))
    assert np.allclose(got, want, rtol=1e-12, atol=1e-12)


def test_rsd_fused_sort_interp_matches_reference(rng):
    """Fused bitonic-sort + banded-interp kernel (interpret mode) vs the
    sort + full-telescoping reference, including the validity flag."""
    from jax import lax
    from fastbox_tpu.ops.pallas.rsd_fused import rsd_sort_interp_pallas
    from fastbox_tpu.ops.rsd import remap_los_batched

    M, C, w = 256, 128, 4
    zt = np.linspace(0.0, 127.0, C)
    dz = zt[1] - zt[0]
    s = zt[None, :] + rng.uniform(-w * dz * 0.9, w * dz * 0.9, size=(M, C))
    # scramble row order so the in-kernel sort actually works
    v = rng.standard_normal((M, C))
    fill = rng.standard_normal(M)

    out, ok = rsd_sort_interp_pallas(jnp.asarray(s), jnp.asarray(v),
                                     jnp.asarray(zt), jnp.asarray(fill),
                                     band=w, tol=w * dz, interpret=True)
    assert bool(ok)
    want = np.asarray(remap_los_batched(jnp.asarray(v), jnp.asarray(s),
                                        jnp.asarray(zt), jnp.asarray(fill),
                                        band=0))
    assert np.allclose(np.asarray(out), want, rtol=1e-12, atol=1e-12)


def test_rsd_fused_flag_false_on_violation(rng):
    from fastbox_tpu.ops.pallas.rsd_fused import rsd_sort_interp_pallas

    M, C, w = 256, 128, 4
    zt = np.linspace(0.0, 127.0, C)
    dz = zt[1] - zt[0]
    s = zt[None, :] + rng.uniform(-20 * dz, 20 * dz, size=(M, C))
    v = rng.standard_normal((M, C))
    _, ok = rsd_sort_interp_pallas(jnp.asarray(s), jnp.asarray(v),
                                   jnp.asarray(zt),
                                   jnp.zeros(M), band=w, tol=w * dz,
                                   interpret=True)
    assert not bool(ok)
