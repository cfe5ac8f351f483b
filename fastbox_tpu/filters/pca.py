"""PCA foreground filter (the workhorse cleaner).

Reference: ``fastbox.filters.pca_filter`` (filters.py:93-183).  The reference
reshapes to (Nfreq, Npix), subtracts the mean spectrum, builds the
freq-freq covariance with ``np.cov`` (ddof=1), eigendecomposes, and subtracts
the projection onto the top ``nmodes`` eigenvectors plus the mean.

On TPU this is two GEMMs (covariance, projection) and an Nfreq x Nfreq
``eigh`` — all fused into the jitted pipeline.  The cleaned field is
invariant under the eigenvector sign/rotation ambiguity, so results match
the reference's ``np.linalg.eig`` path exactly (the covariance is symmetric).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.numpy.linalg import eigh

__all__ = ["pca_filter", "mean_spectrum_filter"]


@jax.jit
def mean_spectrum_filter(field):
    """Subtract the pixel-mean spectrum from each channel (filters.py:35-55)."""
    d = field.reshape((-1, field.shape[-1]))  # (Npix, Nfreq)
    return (d - jnp.mean(d, axis=0, keepdims=True)).reshape(field.shape)


@partial(jax.jit, static_argnames=("nmodes", "return_filter"))
def pca_filter(field, nmodes: int, return_filter: bool = False):
    """Subtract the top-``nmodes`` frequency eigenmodes (filters.py:93-183).

    Parameters:
        field: (Nx, Ny, Nfreq) datacube; last axis is frequency.
        nmodes: number of eigenmodes (by descending eigenvalue) to remove.
        return_filter: also return (U_fg, fg_amps) like the reference.

    Returns:
        cleaned_field, and optionally (U_fg (Nfreq, nmodes),
        fg_amps (nmodes, Npix)).
    """
    shape = field.shape
    d = field.reshape((-1, shape[-1])).T  # (Nfreq, Npix)
    npix = d.shape[1]

    d_mean = jnp.mean(d, axis=-1, keepdims=True)
    x = d - d_mean

    # np.cov with ddof=1 (rows already mean-free).  These three GEMMs run
    # at HIGHEST precision: at DEFAULT the MXU does a single bf16 pass,
    # and that rounding alone moved the PCA-cleaned P(k) low bins ~4e-2
    # relative to the f64 oracle on the same realisation — 14x the f32
    # conditioning floor — while HIGHEST sits at the floor
    # (scripts/truth_gate.py, TRUTH_GATE.json).  Cost: the (C, Npix, C)
    # covariance GEMM is ~1% of the pipeline even 6-passed.
    prec = jax.lax.Precision.HIGHEST
    cov = jnp.matmul(x, x.T, precision=prec) / (npix - 1)

    eigvals, eigvecs = eigh(cov)          # ascending
    U_fg = eigvecs[:, ::-1][:, :nmodes]   # top modes, descending eigenvalue

    fg_amps = jnp.matmul(U_fg.T, x, precision=prec)   # (nmodes, Npix)
    fg_field = (jnp.matmul(U_fg, fg_amps, precision=prec)
                + d_mean).T.reshape(shape)
    cleaned = field - fg_field

    if return_filter:
        return cleaned, U_fg, fg_amps
    return cleaned


@partial(jax.jit, static_argnames=("nmodes", "iters"))
def pca_filter_subspace(field, nmodes: int, iters: int = 16):
    """PCA clean via subspace (block power) iteration instead of a full eigh.

    The cleaned field depends only on the span of the top eigenvectors.
    When those eigenvalues are well separated, block power iteration
    converges to the same span quickly, avoiding the TPU's slow small-matrix
    eigendecomposition.  CAVEAT: when the trailing kept modes sit in a
    quasi-degenerate noise floor, the "top-n span" is ill-conditioned and
    this approximation differs from exact eigh at the degenerate-mode
    amplitude — use ``pca_filter`` when exactness matters.
    """
    shape = field.shape
    d = field.reshape((-1, shape[-1])).T
    npix = d.shape[1]
    d_mean = jnp.mean(d, axis=-1, keepdims=True)
    x = d - d_mean
    prec = jax.lax.Precision.HIGHEST  # see pca_filter: bf16 GEMMs move
    cov = jnp.matmul(x, x.T, precision=prec) / (npix - 1)  # cleaned P(k) 4e-2

    Q, _ = jnp.linalg.qr(cov[:, :nmodes])

    def body(_, Q):
        # Orthonormalise via QR each step: with a large eigengap the columns
        # collapse toward the top eigenvector after one multiply, so a
        # Cholesky-of-Gram orthonormalisation goes singular.
        Y = jnp.matmul(cov, Q, precision=prec)
        Qn, _ = jnp.linalg.qr(Y)
        return Qn

    Q = jax.lax.fori_loop(0, iters, body, Q)

    fg_amps = jnp.matmul(Q.T, x, precision=prec)
    fg_field = (jnp.matmul(Q, fg_amps, precision=prec)
                + d_mean).T.reshape(shape)
    return field - fg_field
