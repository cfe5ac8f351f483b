"""Non-negative matrix factorisation foreground filter, native JAX.

Reference: ``fastbox.filters.nmf_filter`` (filters.py:373-432) wraps
``sklearn.decomposition.NMF``.  Here NMF is solved on device with the
classical multiplicative-update rules for the Frobenius objective, from a
deterministic NNDSVDa initialisation (so results are reproducible without an
RNG).  The input must be non-negative, as in the reference.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["nmf", "nmf_filter"]

_EPS = 1e-12


def _nndsvda_init(X, k):
    """Deterministic NNDSVDa initialisation (Boutsidis & Gallopoulos 2008)."""
    U, S, Vt = jnp.linalg.svd(X, full_matrices=False)
    W = jnp.zeros((X.shape[0], k), X.dtype)
    H = jnp.zeros((k, X.shape[1]), X.dtype)
    # Leading factor
    W = W.at[:, 0].set(jnp.sqrt(S[0]) * jnp.abs(U[:, 0]))
    H = H.at[0, :].set(jnp.sqrt(S[0]) * jnp.abs(Vt[0, :]))
    for j in range(1, k):
        u, v = U[:, j], Vt[j, :]
        up, un = jnp.maximum(u, 0), jnp.maximum(-u, 0)
        vp, vn = jnp.maximum(v, 0), jnp.maximum(-v, 0)
        nup, nun = jnp.linalg.norm(up), jnp.linalg.norm(un)
        nvp, nvn = jnp.linalg.norm(vp), jnp.linalg.norm(vn)
        mp, mn = nup * nvp, nun * nvn
        use_p = mp >= mn
        sig = jnp.where(use_p, mp, mn)
        uu = jnp.where(use_p, up / jnp.maximum(nup, _EPS),
                       un / jnp.maximum(nun, _EPS))
        vv = jnp.where(use_p, vp / jnp.maximum(nvp, _EPS),
                       vn / jnp.maximum(nvn, _EPS))
        W = W.at[:, j].set(jnp.sqrt(S[j] * sig) * uu)
        H = H.at[j, :].set(jnp.sqrt(S[j] * sig) * vv)
    # 'a' variant: replace zeros with the data mean
    avg = jnp.mean(X)
    W = jnp.where(W <= 0, avg, W)
    H = jnp.where(H <= 0, avg, H)
    return W, H


@partial(jax.jit, static_argnames=("n_components", "max_iter"))
def nmf(X, n_components: int, max_iter: int = 200):
    """Factor non-negative X ~ W H; returns (W, H)."""
    W, H = _nndsvda_init(X, n_components)

    def body(_, WH):
        W, H = WH
        H = H * (W.T @ X) / jnp.maximum(W.T @ W @ H, _EPS)
        W = W * (X @ H.T) / jnp.maximum(W @ (H @ H.T), _EPS)
        return W, H

    W, H = jax.lax.fori_loop(0, max_iter, body, (W, H))
    return W, H


def nmf_filter(field, nmodes: int, return_filter: bool = False,
               max_iter: int = 200):
    """NMF foreground clean of a non-negative datacube (filters.py:373-432).

    Note the reference does *not* mean-subtract before NMF (the data must
    stay non-negative); neither do we.
    """
    shape = field.shape
    x = field.reshape((-1, shape[-1])).T  # (Nfreq, Npix)
    W, H = nmf(x, nmodes, max_iter=max_iter)
    x_fg = W @ H
    cleaned = (x - x_fg).T.reshape(shape)
    if return_filter:
        return cleaned, (W, H)
    return cleaned
