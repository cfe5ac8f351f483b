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
