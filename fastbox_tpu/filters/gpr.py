"""Gaussian-process-regression foreground filter, native JAX + optax.

Reference: ``fastbox.filters.gpr_filter`` (filters.py:494-595) wraps GPy with
an RBF (foreground) + Exponential (signal) kernel, bounded hyperparameters,
and subtracts the foreground posterior mean.  Here the same model is a small
JAX marginal-likelihood optimisation over the (Nfreq x Nfreq) kernel matrix:

  * frequencies normalised to [0, 1] (filters.py:553)
  * RBF foreground kernel: variance in [1e-4, 1e2] x var(x),
    lengthscale in [1e-3, 1e2]  (filters.py:559-563)
  * Exponential signal kernel: variance in [1e-14, 1e-4] x var(x),
    lengthscale in [1e-6, 1e-3]  (filters.py:565-567)
  * Gaussian noise variance (GPy's default likelihood), freely optimised
  * hyperparameters optimised by Adam on the multi-output log marginal
    likelihood; bounds enforced by sigmoid reparameterisation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

__all__ = ["gpr_filter"]


def _rbf(nu, var, ls):
    d2 = (nu[:, None] - nu[None, :]) ** 2
    return var * jnp.exp(-0.5 * d2 / ls**2)


def _exponential(nu, var, ls):
    d = jnp.abs(nu[:, None] - nu[None, :])
    return var * jnp.exp(-d / ls)


def _bounded(theta, lo, hi):
    """Map an unconstrained parameter to (lo, hi) via sigmoid (log-spaced)."""
    return jnp.exp(jnp.log(lo) + jax.nn.sigmoid(theta) * (jnp.log(hi) - jnp.log(lo)))


@partial(jax.jit, static_argnames=("nsteps",))
def _fit_gpr(x, bounds, nsteps: int = 500, lr: float = 0.05):
    """x: (Nfreq, Npix).  Returns optimised (raw params, final loss)."""
    nfreq, npix = x.shape
    nu = jnp.linspace(0.0, 1.0, nfreq, dtype=x.dtype)

    def unpack(theta):
        vf = _bounded(theta[0], bounds[0][0], bounds[0][1])
        lf = _bounded(theta[1], bounds[1][0], bounds[1][1])
        vs = _bounded(theta[2], bounds[2][0], bounds[2][1])
        ls = _bounded(theta[3], bounds[3][0], bounds[3][1])
        vn = _bounded(theta[4], bounds[4][0], bounds[4][1])
        return vf, lf, vs, ls, vn

    def neg_log_marginal(theta):
        vf, lf, vs, ls, vn = unpack(theta)
        K = _rbf(nu, vf, lf) + _exponential(nu, vs, ls) \
            + vn * jnp.eye(nfreq, dtype=x.dtype)
        L = jnp.linalg.cholesky(K)
        alpha = jax.scipy.linalg.cho_solve((L, True), x)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        return 0.5 * (jnp.sum(x * alpha) + npix * logdet)

    theta0 = jnp.zeros(5, dtype=x.dtype)
    opt = optax.adam(lr)
    state = opt.init(theta0)

    def step(carry, _):
        theta, state = carry
        loss, g = jax.value_and_grad(neg_log_marginal)(theta)
        updates, state = opt.update(g, state)
        return (optax.apply_updates(theta, updates), state), loss

    (theta, _), losses = jax.lax.scan(step, (theta0, state), None, length=nsteps)
    return theta, unpack(theta), losses[-1]


def gpr_filter(field, kernels=None, return_filter: bool = False,
               opt_messages: bool = False, opt_num_restarts: int = 0,
               nsteps: int = 500):
    """GPR foreground clean of a (Nx, Ny, Nfreq) datacube (filters.py:494-595).

    Subtracts the RBF (foreground) posterior mean; the Exponential component
    and noise stay in the residual.

    ``kernels``, ``opt_messages`` and ``opt_num_restarts`` exist for
    signature parity with the reference's GPy wrapper; custom GPy kernel
    objects cannot be consumed here (the RBF+Exponential default — the
    reference's own default — is always used), and the Adam optimiser does
    not restart.
    """
    if kernels is not None:
        raise NotImplementedError(
            "custom GPy kernels are not supported; the default "
            "RBF(foreground) + Exponential(signal) model is used")
    del opt_messages, opt_num_restarts
    shape = field.shape
    d = field.reshape((-1, shape[-1])).T        # (Nfreq, Npix)
    x = d - jnp.mean(d, axis=1, keepdims=True)
    var = jnp.var(x)

    bounds = (
        (1e-4 * var, 1e2 * var),   # fg variance
        (1e-3, 1e2),               # fg lengthscale
        (1e-14 * var, 1e-4 * var), # signal variance
        (1e-6, 1e-3),              # signal lengthscale
        (1e-8 * var, 1e2 * var),   # noise variance
    )
    _, params, _ = _fit_gpr(x, bounds, nsteps=nsteps)
    vf, lf, vs, ls, vn = params

    nfreq = shape[-1]
    nu = jnp.linspace(0.0, 1.0, nfreq, dtype=x.dtype)
    K_fg = _rbf(nu, vf, lf)
    K_tot = K_fg + _exponential(nu, vs, ls) + vn * jnp.eye(nfreq, dtype=x.dtype)
    # Foreground posterior mean: K_fg K_tot^-1 x
    L = jnp.linalg.cholesky(K_tot)
    x_fg = K_fg @ jax.scipy.linalg.cho_solve((L, True), x)

    cleaned = (x - x_fg).T.reshape(shape)
    if return_filter:
        return cleaned, params
    return cleaned
