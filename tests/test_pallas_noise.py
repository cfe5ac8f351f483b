"""Fused add-scaled-normal kernel: statistics + reproducibility.

The kernel uses the TPU on-core PRNG (pltpu.prng_*), which has no CPU
interpreter support — kernel-level tests only run on TPU-like backends
(scripts/tpu_kernel_checks.py drives them on hardware); the CPU suite
covers the dispatch fallback.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastbox_tpu.ops.pallas.noise import add_scaled_normal_pallas

pytestmark_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="pltpu.prng_* has no CPU interpreter support")


def _run(x, scale, seed):
    return np.asarray(add_scaled_normal_pallas(
        x, scale, seed, interpret=jax.devices()[0].platform == "cpu"))


@pytestmark_tpu
def test_add_scaled_normal_statistics():
    R, C = 512, 128
    x = jnp.ones((R, C), jnp.float32) * 5.0
    scale = jnp.full(C, 2.0, jnp.float32)
    out = _run(x, scale, 1234)
    noise = (out - 5.0) / 2.0
    n = noise.size
    assert abs(noise.mean()) < 5.0 / np.sqrt(n)
    assert abs(noise.std() - 1.0) < 0.01
    # third/fourth moments of a standard normal
    assert abs(np.mean(noise**3)) < 0.05
    assert abs(np.mean(noise**4) - 3.0) < 0.15


@pytestmark_tpu
def test_add_scaled_normal_per_column_scale():
    R, C = 256, 128
    x = jnp.zeros((R, C), jnp.float32)
    scale = jnp.asarray(np.linspace(0.5, 3.0, C), jnp.float32)
    out = _run(x, scale, 7)
    col_std = out.std(axis=0)
    assert np.all(np.abs(col_std / np.asarray(scale) - 1.0) < 0.35)


@pytestmark_tpu
def test_add_scaled_normal_deterministic():
    R, C = 256, 128
    x = jnp.zeros((R, C), jnp.float32)
    scale = jnp.ones(C, jnp.float32)
    a = _run(x, scale, 42)
    b = _run(x, scale, 42)
    c = _run(x, scale, 43)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    # blocks must not repeat each other (per-block reseeding)
    assert not np.array_equal(a[:128], a[128:256]) or R == 128


def test_add_scaled_normal_dispatch_fallback():
    """Off-TPU the helper falls back to jax.random.normal."""
    from fastbox_tpu.ops.rsd import add_scaled_normal

    x = jnp.zeros((8, 8, 16), jnp.float64)
    out = np.asarray(add_scaled_normal(x, jnp.full(16, 3.0), 
                                       jax.random.PRNGKey(0)))
    assert out.shape == (8, 8, 16)
    assert 1.0 < out.std() < 5.0
