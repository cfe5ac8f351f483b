"""Kernel-PCA foreground filters, native JAX.

The reference ships TWO distinct KPCA cleaners (filters.py:246-370), both
wrapping sklearn's KernelPCA with ``fit_inverse_transform=True``:

* ``kernel_pca_filter_legacy`` (filters.py:309-370) — the standard
  algorithm: fit the top ``nmodes`` kernel eigenmodes, inverse-transform
  them back to the data space (kernel ridge regression), and subtract that
  reconstruction from the data.

* ``kernel_pca_filter`` (filters.py:246-306) — a manual inverse transform
  that keeps ONLY the smallest-eigenvalue retained mode: the kernel between
  the 1-D projections onto that mode (ridge diagonal added, matching the
  reference's ``K.flat[::n+1] += alpha``) is applied to the dual
  coefficients learned from the full ``nmodes`` fit, and that
  reconstruction IS the returned "cleaned" field (no subtraction).  The
  idea: the top modes carry the foregrounds, so the weakest retained mode
  approximates the signal.

Both are pure JAX: an (Npix x Npix) kernel eigh plus GEMMs.  As the
reference warns, the kernel matrix is quadratic in pixel count — intended
for modest maps.
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
def _kpca_fit(X, nmodes: int, kernel: str, gamma, alpha_ridge):
    """Fit KPCA on samples X (n, n_features).

    Returns ``(proj, dual)``: the training-point projections onto the top
    ``nmodes`` kernel eigenmodes (n, nmodes), and the inverse-transform
    dual coefficients (n, n_features) learned by kernel ridge regression
    exactly as sklearn's ``fit_inverse_transform`` does.
    """
    n = X.shape[0]
    K = _kernel(X, X, kernel, gamma)
    one = jnp.ones((n, n), X.dtype) / n
    Kc = K - one @ K - K @ one + one @ K @ one

    vals, vecs = jnp.linalg.eigh(Kc)              # ascending
    vals = jnp.maximum(vals[::-1][:nmodes], 1e-12)
    vecs = vecs[:, ::-1][:, :nmodes]
    proj = vecs * jnp.sqrt(vals)[None, :]         # (n, nmodes)

    Kp = _kernel(proj, proj, kernel, gamma)
    Kp = Kp + alpha_ridge * jnp.eye(n, dtype=X.dtype)
    dual = jnp.linalg.solve(Kp, X)                # (n, n_features)
    return proj, dual


def _prepare(field):
    shape = field.shape
    d = field.reshape((-1, shape[-1])).T          # (Nfreq, Npix)
    x = d - jnp.mean(d, axis=1, keepdims=True)
    return shape, x, x.T                           # samples = pixels


def kernel_pca_filter_legacy(field, nmodes: int, kernel: str = "linear",
                             gamma: float | None = None,
                             alpha_ridge: float = 1.0,
                             return_filter: bool = False):
    """Standard KPCA clean: subtract the top-modes reconstruction
    (reference filters.py:309-370).

    The pixel-mean spectrum is subtracted first; samples are pixels,
    features are frequencies (the reference's ``x.T`` layout).
    """
    shape, x, X = _prepare(field)
    if gamma is None:
        gamma = 1.0 / shape[-1]
    proj, dual = _kpca_fit(X, nmodes, kernel, gamma, alpha_ridge)
    X_fg = _kernel(proj, proj, kernel, gamma) @ dual   # inverse transform
    cleaned = (x - X_fg.T).T.reshape(shape)
    if return_filter:
        return cleaned, (proj, dual)
    return cleaned


def kernel_pca_filter(field, nmodes: int, kernel: str = "linear",
                      gamma: float | None = None, alpha_ridge: float = 1.0,
                      return_filter: bool = False):
    """Smallest-retained-mode KPCA clean (reference filters.py:246-306).

    Reproduces the reference's manual inverse transform: the kernel of the
    projections onto the *last* (smallest-eigenvalue) retained mode — with
    the ridge term added to its diagonal, as the reference does at
    filters.py:299 — is applied to the dual coefficients of the full
    ``nmodes`` fit, and that reconstruction is returned directly as the
    cleaned field.
    """
    shape, _, X = _prepare(field)
    if gamma is None:
        gamma = 1.0 / shape[-1]
    proj, dual = _kpca_fit(X, nmodes, kernel, gamma, alpha_ridge)
    p_last = proj[:, -1:]                          # (n, 1)
    K1 = _kernel(p_last, p_last, kernel, gamma)
    K1 = K1 + alpha_ridge * jnp.eye(K1.shape[0], dtype=K1.dtype)
    cleaned = (K1 @ dual).reshape(shape)
    if return_filter:
        return cleaned, (proj, dual)
    return cleaned
