"""RFI in-painting: Gaussian constrained realisations + LSSA.

Reference: ``fastbox/inpaint.py``.  The GCR solver there loops over pixels
calling scipy's conjugate gradient per pixel with per-pixel ``sqrtm`` calls
(inpaint.py:35-155).  Here the matrix square roots come from batched
``eigh`` and the CG solve is ``jax.scipy.sparse.linalg.cg`` vmapped over all
pixels at once.  The LSSA sinusoid fits (inpaint.py:192-306) are quadratic
in the amplitudes, so the per-mode scipy ``minimize`` loop collapses to a
closed-form weighted least-squares solve, vmapped over modes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "simple_signal_cov",
    "gaussian_cr_1d",
    "trim_flagged_channels",
    "lssa_fit_modes",
    "lssa_decorr_matrix",
    "lssa_pspec",
]


def simple_signal_cov(freqs, amplitude, width, ridge_var=1e-10):
    """Gaussian-correlation signal covariance (inpaint.py:8-32)."""
    freqs = jnp.asarray(freqs)
    nu, nup = jnp.meshgrid(freqs, freqs)
    return (amplitude * jnp.exp(-0.5 * (nu - nup) ** 2 / width**2)
            + ridge_var * jnp.eye(freqs.size))


def _psd_sqrt(M):
    """Symmetric PSD matrix square root via eigh."""
    vals, vecs = jnp.linalg.eigh(M)
    vals = jnp.maximum(vals, 0.0)
    return (vecs * jnp.sqrt(vals)[None, :]) @ vecs.T


def gaussian_cr_1d(d, w, S, N, realisations=1, add_noise=True, key=None,
                   cg_maxiter=10000, cg_tol=1e-8, verbose=False):
    """Gaussian constrained realisations for flagged 1D spectra
    (inpaint.py:35-155).

    Solves, per pixel, the rescaled CR equation A x = b with
    A = S^1/2 (w N^-1 w) S^1/2 + I and
    b = S^1/2 N^-1 (w d) + omega_N + S^1/2 (w N^-1 w)^1/2 omega_S,
    returning s = S^1/2 x (+ N^1/2 omega_N if ``add_noise``).

    Parameters:
        d: (Npix, Nfreq) data.
        w: (Npix, Nfreq) flag vector (1 unflagged, 0 flagged).
        S, N: (Nfreq, Nfreq) signal/noise covariances.
        realisations: number of constrained realisations.
        key: jax PRNG key (replaces the reference's global numpy RNG).

    Returns:
        (realisations, Npix, Nfreq) array of solutions.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    d = jnp.asarray(d)
    w = jnp.asarray(w)
    S = jnp.asarray(S)
    N = jnp.asarray(N)
    npix, nfreq = d.shape

    sqrtS = _psd_sqrt(S)
    sqrtN = _psd_sqrt(N)
    Ninv = jnp.linalg.inv(N)
    eye = jnp.eye(nfreq, dtype=d.dtype)

    def solve_pixel(dj, wj, omegaN, omegaS):
        Ninvw = wj[:, None] * Ninv * wj[None, :]
        sqrtNinvw = _psd_sqrt(Ninvw)
        A = sqrtS @ Ninvw @ sqrtS + eye
        b = sqrtS @ (Ninv @ (wj * dj))
        b_cr = b + omegaN + sqrtS @ (sqrtNinvw @ omegaS)
        x, _ = jax.scipy.sparse.linalg.cg(lambda v: A @ v, b_cr,
                                          maxiter=int(cg_maxiter), tol=cg_tol)
        s = sqrtS @ x
        if add_noise:
            s = s + sqrtN @ omegaN
        return s

    keys = jax.random.split(key, realisations)
    out = []
    for i in range(realisations):
        kN, kS = jax.random.split(keys[i])
        omegaN = jax.random.normal(kN, (npix, nfreq), dtype=d.dtype)
        omegaS = jax.random.normal(kS, (npix, nfreq), dtype=d.dtype)
        out.append(jax.vmap(solve_pixel)(d, w, omegaN, omegaS))
    return jnp.stack(out)


def trim_flagged_channels(w, x):
    """Drop flagged channels from a 1D or square 2D array (inpaint.py:158-183)."""
    w = np.asarray(w)
    x = np.asarray(x)
    assert x.shape == (w.size,) or x.shape == (w.size, w.size), \
        "Input array must have shape (w.size) or (w.size, w.size)"
    if x.ndim == 1:
        return x[w == 1.0]
    return x[:, w == 1.0][w == 1.0, :]


def lssa_fit_modes(d, freqs, invcov=None, fit_amp_phase=True, tau=None,
                   taper=None):
    """Weighted LSSA fit of complex sinusoids to masked 1D data
    (inpaint.py:192-306).

    The log-likelihood is exactly quadratic in the complex amplitude
    A = A_re + i A_im for each tau, so the minimiser is the closed-form
    generalised-least-squares solution — mathematically the exact optimum
    the reference's bounded L-BFGS-B search approximates.  Fits all modes
    at once (vmapped).

    Returns (tau [ns], param1, param2): amplitude+phase if
    ``fit_amp_phase`` else (A_re, A_im).
    """
    d = jnp.asarray(d)
    freqs = jnp.asarray(freqs)
    assert d.size == invcov.shape[0] == invcov.shape[1] == freqs.size, \
        "Data, inv. covariance, and freqs array must have same number of channels"
    invcov = jnp.asarray(invcov)

    if tau is None:
        tau = np.fft.fftfreq(n=freqs.size, d=float(freqs[1] - freqs[0])) * 1e3
    tau = jnp.asarray(tau)

    t = jnp.ones_like(freqs) if taper is None else jnp.asarray(taper)

    def fit_one(tau_n):
        # model m = A exp(2 pi i tau nu); residual x = taper (d - m)
        phase = jnp.exp(2.0j * jnp.pi * tau_n * freqs)
        g = t * phase          # taper-weighted basis
        td = t * d
        # minimise (td - A g)^H C^-1 (td - A g) over complex A
        denom = jnp.real(jnp.conj(g) @ (invcov @ g))
        num = jnp.conj(g) @ (invcov @ td)
        A = num / jnp.where(denom != 0.0, denom, 1.0)
        return jnp.real(A), jnp.imag(A)

    A_re, A_im = jax.vmap(fit_one)(tau)
    if fit_amp_phase:
        amp = jnp.sqrt(A_re**2 + A_im**2)
        ph = jnp.mod(jnp.arctan2(A_im, A_re), 2.0 * jnp.pi)
        return tau, amp, ph
    return tau, A_re, A_im


def lssa_decorr_matrix(w, tau, freqs):
    """Rotation decorrelating the real/imag LSSA amplitudes
    (inpaint.py:309-361)."""
    w = jnp.asarray(w)
    freqs = jnp.asarray(freqs)
    cos = w * jnp.cos(2.0 * jnp.pi * tau * freqs / 1e3)
    sin = w * jnp.sin(2.0 * jnp.pi * tau * freqs / 1e3)
    cov = jnp.array([[jnp.sum(cos * cos), jnp.sum(cos * sin)],
                     [jnp.sum(cos * sin), jnp.sum(sin * sin)]])
    theta = 0.5 * jnp.arctan2(2.0 * jnp.sum(cos * sin),
                              jnp.sum(cos * cos) - jnp.sum(sin * sin))
    rot = jnp.array([[jnp.cos(theta), jnp.sin(theta)],
                     [-jnp.sin(theta), jnp.cos(theta)]])
    rinv = rot.T
    eigvals = jnp.diag(rot @ cov @ rinv)
    return rot, eigvals


def lssa_pspec(A_re, A_im, w, tau, freqs, decorrelate_amps=True):
    """LSSA power spectrum with decorrelation re-weighting
    (inpaint.py:364-399)."""
    A_re = jnp.asarray(A_re)
    A_im = jnp.asarray(A_im)
    tau = jnp.asarray(tau)

    def one(tau_i, ar, ai):
        rot, eig = lssa_decorr_matrix(w, tau_i, freqs)
        A1, A2 = rot @ jnp.array([ar, ai])
        return ((A1 * eig[1]) ** 2 + (A2 * eig[0]) ** 2) / (eig[0] ** 2 + eig[1] ** 2)

    return jax.vmap(one)(tau, A_re, A_im)
