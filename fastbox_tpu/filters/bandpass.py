"""Angular bandpass and band-power PCA filters.

Reference: ``angular_bandpass_filter`` (filters.py:58-90) and
``bandpower_pca_filter`` (filters.py:435-491).  The reference's bandpower
filter contains a missing-import bug (filters.py:487, SURVEY.md §2.1 #20);
the implementation here is the intended behaviour.
"""
from __future__ import annotations

import jax.numpy as jnp
from ..ops import fft_safe
import numpy as np

from .pca import mean_spectrum_filter, pca_filter

__all__ = ["angular_bandpass_filter", "bandpower_pca_filter"]


def _kperp_fftfreq(n0: int, n1: int, d: float):
    """|k_perp| grid in fft.fftfreq units (filters.py:84-87 convention)."""
    kx = np.fft.fftfreq(n0, d=d)
    ky = np.fft.fftfreq(n1, d=d)
    # Reference meshgrid(kx, kx) uses xy indexing; k is symmetric in (x, y)
    return np.sqrt(kx[:, None] ** 2 + ky[None, :] ** 2)


def angular_bandpass_filter(field, kmin: float, kmax: float, d: float = 1.0):
    """Top-hat |k_perp| bandpass per frequency slice (filters.py:58-90).

    Wavenumbers are in ``fft.fftfreq`` units with pixel width ``d``; modes
    with k_perp outside [kmin, kmax) are zeroed.  Returns a complex field
    (the reference returns the raw ifftn output).
    """
    field_k = fft_safe.fftn(field, axes=(0, 1))
    k = _kperp_fftfreq(field.shape[0], field.shape[1], d)
    keep = jnp.asarray((k >= kmin) & (k < kmax))
    field_k = field_k * keep[:, :, None]
    return fft_safe.ifftn(field_k, axes=(0, 1))


def bandpower_pca_filter(field, nbands: int, modes):
    """Per-sub-band PCA cleaning (filters.py:435-491, intended behaviour).

    The |k_perp| range is split into ``nbands`` contiguous top-hat bands;
    each bandpassed cube is PCA-cleaned with its own mode count and the
    results are summed.
    """
    if isinstance(modes, (int, np.integer)):
        modes = modes * np.ones(nbands, dtype=int)
    assert nbands == len(modes), "len(modes) must equal nbands"

    k = _kperp_fftfreq(field.shape[0], field.shape[1], 1.0)
    band_edges = np.linspace(np.min(k), np.max(k), nbands + 1)

    x = mean_spectrum_filter(field)
    cleaned = jnp.zeros_like(field)
    for i in range(nbands):
        bpf = angular_bandpass_filter(x, kmin=band_edges[i],
                                      kmax=band_edges[i + 1]).real
        cleaned = cleaned + pca_filter(bpf, nmodes=int(modes[i]))
    return cleaned
