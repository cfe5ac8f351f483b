"""Standalone sharded PCA filter vs the single-device filter — exact."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fastbox_tpu.filters.pca import pca_filter
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.parallel import make_sharded_pca_filter

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_pca_matches_single_device():
    N, nf, nmodes = 16, 12, 2
    grid = GridSpec.create(box_scale=(1e3,) * 3, nsamp=N, redshift=0.8)
    rng = np.random.default_rng(5)
    # smooth foregrounds (low-rank in frequency) + white signal
    freqs = np.linspace(0.8, 1.2, nf)
    # two well-separated FG modes; nmodes=2 keeps the removed span away
    # from the degenerate noise floor (where eigh spans are ill-conditioned
    # and any summation-order difference is amplified)
    fg = (rng.standard_normal((N, N, 1)) * freqs[None, None, :] ** -2.7
          + 0.1 * rng.standard_normal((N, N, 1)) * freqs[None, None, :] ** 2.5)
    data = jnp.asarray(100.0 * fg + 0.01 * rng.standard_normal((N, N, nf)))

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("space",))
    fn = make_sharded_pca_filter(mesh, grid, nmodes=nmodes)
    cleaned_s, fg_s = fn(data)
    cleaned, U, amps = pca_filter(data, nmodes, return_filter=True)
    np.testing.assert_allclose(np.asarray(cleaned_s), np.asarray(cleaned),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(fg_s),
                               np.asarray(data) - np.asarray(cleaned),
                               rtol=1e-9, atol=1e-9)
