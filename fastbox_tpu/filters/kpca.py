"""Kernel-PCA foreground filter, native JAX.

Reference: ``fastbox.filters.kernel_pca_filter`` / ``..._legacy``
(filters.py:246-370), wrapping sklearn's KernelPCA.  The *legacy* variant is
the standard algorithm (fit top modes, inverse-transform, subtract); the
non-legacy variant relies on sklearn internals that changed behaviour and is
documented broken.  Here we implement the standard KPCA clean on device:

  1. centre the kernel matrix K of the (Npix, Nfreq) samples,
  2. take the top ``nmodes`` eigenvectors,
  3. reconstruct via kernel ridge regression onto the original space
     (sklearn's ``fit_inverse_transform`` approach),
  4. subtract the reconstruction.

Beware: the kernel matrix is (Npix x Npix); intended for modest pixel
counts, as the reference warns ("Can use a lot of memory").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["kernel_pca_filter", "kernel_pca_filter_legacy"]


def _kernel(X, Y, kind: str, gamma):
    if kind == "linear":
        return X @ Y.T
    if kind == "rbf":
        d2 = (jnp.sum(X**2, 1)[:, None] + jnp.sum(Y**2, 1)[None, :]
              - 2.0 * X @ Y.T)
        return jnp.exp(-gamma * jnp.maximum(d2, 0.0))
    if kind == "poly3":
        return (gamma * X @ Y.T + 1.0) ** 3
    raise ValueError(f"Unknown kernel '{kind}'")


@partial(jax.jit, static_argnames=("nmodes", "kernel"))
def _kpca_reconstruct(X, nmodes: int, kernel: str, gamma, alpha_ridge):
    """X: (n_samples, n_features). Returns the KPCA reconstruction of X."""
    n = X.shape[0]
    K = _kernel(X, X, kernel, gamma)
    one = jnp.ones((n, n), X.dtype) / n
    Kc = K - one @ K - K @ one + one @ K @ one

    vals, vecs = jnp.linalg.eigh(Kc)              # ascending
    vals = vals[::-1][:nmodes]
    vecs = vecs[:, ::-1][:, :nmodes]
    vals = jnp.maximum(vals, 1e-12)
    # Projections of the training points (n, nmodes)
    proj = vecs * jnp.sqrt(vals)[None, :]

    # Inverse transform: kernel ridge from projection space back to X
    # (sklearn fit_inverse_transform): learn dual coefs on K_proj
    Kp = _kernel(proj, proj, kernel, gamma)
    Kp = Kp + alpha_ridge * jnp.eye(n, dtype=X.dtype)
    dual = jnp.linalg.solve(Kp, X)                # (n, n_features)
    return _kernel(proj, proj, kernel, gamma) @ dual


def kernel_pca_filter(field, nmodes: int, kernel: str = "linear",
                      gamma: float | None = None, alpha_ridge: float = 1.0,
                      return_filter: bool = False):
    """KPCA foreground clean of a datacube (filters.py:309-370 semantics).

    The pixel-mean spectrum is subtracted first; samples are pixels,
    features are frequencies (like the reference's ``x.T`` layout).
    """
    shape = field.shape
    d = field.reshape((-1, shape[-1])).T          # (Nfreq, Npix)
    x = d - jnp.mean(d, axis=1, keepdims=True)
    X = x.T                                       # (Npix, Nfreq) samples
    if gamma is None:
        gamma = 1.0 / shape[-1]
    X_fg = _kpca_reconstruct(X, nmodes, kernel, gamma, alpha_ridge)
    cleaned = (x - X_fg.T).T.reshape(shape)
    if return_filter:
        return cleaned, X_fg
    return cleaned


# The reference ships two variants (filters.py:246-370); the "legacy" one is
# the standard fit/inverse-transform/subtract algorithm, which is what this
# module implements.  Alias for API parity.
kernel_pca_filter_legacy = kernel_pca_filter
