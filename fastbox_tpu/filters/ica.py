"""FastICA foreground filter, implemented natively in JAX.

Reference: ``fastbox.filters.ica_filter`` (filters.py:187-243) wraps
``sklearn.decomposition.FastICA``.  Here the parallel (symmetric) FastICA
fixed-point iteration with the logcosh contrast runs on device inside a
``lax.while_loop`` — no host round trips, no Cython.

Note on semantics: FastICA's *reconstruction* (fit_transform followed by
inverse_transform) spans exactly the top-``nmodes`` principal subspace of the
whitened data, so the *cleaned* field equals the PCA-cleaned field regardless
of the ICA rotation; the rotation matters only for interpreting individual
components.  This matches sklearn's behaviour and makes the filter robust to
the iteration's rotational indeterminacy.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["fastica", "ica_filter"]


def _sym_decorrelation(W):
    """W <- (W W^T)^(-1/2) W."""
    s, u = jnp.linalg.eigh(W @ W.T)
    s = jnp.maximum(s, 1e-12)
    return (u * (1.0 / jnp.sqrt(s))) @ u.T @ W


@partial(jax.jit, static_argnames=("n_components", "max_iter"))
def fastica(X, key, n_components: int, max_iter: int = 200, tol: float = 1e-4):
    """Parallel FastICA with logcosh contrast on X of shape (features, samples).

    Returns (components W_unmixing @ whitening, mixing, whitened basis,
    mean), enough to form sources and reconstructions.
    """
    nfeat, nsamp = X.shape
    mean = jnp.mean(X, axis=1, keepdims=True)
    Xc = X - mean

    # Whitening via SVD: Xc = U S Vt; keep n_components
    U, S, _ = jnp.linalg.svd(Xc @ Xc.T / nsamp)
    K = (U[:, :n_components] / jnp.sqrt(S[:n_components])[None, :]).T  # (nc, nfeat)
    Xw = K @ Xc  # (nc, nsamp), unit covariance

    W0 = _sym_decorrelation(jax.random.normal(key, (n_components, n_components)))

    def cond(state):
        _, lim, it = state
        return (lim > tol) & (it < max_iter)

    def body(state):
        W, _, it = state
        WX = W @ Xw
        g = jnp.tanh(WX)
        g_prime = jnp.mean(1.0 - g**2, axis=1)
        W_new = (g @ Xw.T) / nsamp - g_prime[:, None] * W
        W_new = _sym_decorrelation(W_new)
        lim = jnp.max(jnp.abs(jnp.abs(jnp.diagonal(W_new @ W.T)) - 1.0))
        return W_new, lim, it + 1

    W, _, _ = jax.lax.while_loop(cond, body, (W0, jnp.asarray(jnp.inf), 0))
    return W, K, mean


def ica_filter(field, nmodes: int, key=None, return_filter: bool = False,
               max_iter: int = 200, tol: float = 1e-4):
    """ICA foreground clean of a (Nx, Ny, Nfreq) datacube (filters.py:187-243).

    The pixel-mean spectrum is subtracted first, exactly as the reference
    does via ``mean_spectrum_filter``.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    shape = field.shape
    d = field.reshape((-1, shape[-1])).T  # (Nfreq, Npix)
    x = d - jnp.mean(d, axis=1, keepdims=True)  # subtract mean spectrum

    W, K, mean = fastica(x, key, nmodes, max_iter=max_iter, tol=tol)

    # Sources and reconstruction: x_fg = pinv(W K) (W K) (x - mean) + mean
    WK = W @ K                         # (nc, nfeat) unmixing
    sources = WK @ (x - mean)          # (nc, Npix)
    mixing = jnp.linalg.pinv(WK)       # (nfeat, nc)
    x_fg = mixing @ sources + mean

    cleaned = (x - x_fg).T.reshape(shape)
    if return_filter:
        return cleaned, (WK, mixing, sources)
    return cleaned
