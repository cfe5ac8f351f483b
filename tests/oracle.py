"""Numpy/scipy oracle implementations of the reference conventions.

These are independent re-implementations of the algorithms described in
SURVEY.md §2.2 (written against the documented conventions, not copied), used
to cross-validate the JAX pipeline at float64 tolerances on identical
white-noise inputs.  Where the reference delegates to scipy (griddata RSD,
np.cov PCA), the oracle calls scipy directly, so agreement with the oracle
implies agreement with the reference given the same P(k) inputs.
"""
from __future__ import annotations

import numpy as np
from numpy import fft
from scipy.interpolate import griddata


def kgrids(N, Lx, Ly, Lz):
    """Integer index grids and |k| (reference box.py:110-127 conventions)."""
    n = (N * fft.fftfreq(N, 1.0)).astype(np.int64).astype(np.float64)
    Kx = np.broadcast_to(n[:, None, None], (N, N, N))
    Ky = np.broadcast_to(n[None, :, None], (N, N, N))
    Kz = np.broadcast_to(n[None, None, :], (N, N, N))
    k = 2.0 * np.pi * np.sqrt((Kx / Lx) ** 2 + (Ky / Ly) ** 2 + (Kz / Lz) ** 2)
    return Kx, Ky, Kz, k


def gaussian_field(white, pk_grid, boxfactor):
    """Colour complex white noise; return (delta_x, delta_k)."""
    pk = np.nan_to_num(pk_grid) * boxfactor
    delta_k0 = white * np.sqrt(pk)
    delta_x = fft.ifftn(delta_k0).real
    delta_k = fft.fftn(delta_x)
    return delta_x, delta_k


def velocity_field(delta_k, N, Lx, Ly, Lz, fac):
    """v_i(k) = i fac delta_k k_i/k^2 with even-N Nyquist plane zeroing."""
    Kx, Ky, Kz, k = kgrids(N, Lx, Ly, Lz)
    with np.errstate(divide="ignore", invalid="ignore"):
        k2 = k**2
        Ax = 1.0j * delta_k * Kx * (2.0 * np.pi / Lx) / k2
        Ay = 1.0j * delta_k * Ky * (2.0 * np.pi / Ly) / k2
        Az = 1.0j * delta_k * Kz * (2.0 * np.pi / Lz) / k2
    Ax = np.nan_to_num(Ax)
    Ay = np.nan_to_num(Ay)
    Az = np.nan_to_num(Az)
    if N % 2 == 0:
        Ax[Kx == Kx.min()] = 0.0
        Ay[Ky == Ky.min()] = 0.0
        Az[Kz == Kz.min()] = 0.0
    return Ax * fac, Ay * fac, Az * fac


def binned_power_spectrum(delta_k, k, kmin, kmax, boxfactor, nbins=20,
                          kbins=None, index_m=None, kappa=None):
    """Reference-convention binned P(k): digitize + per-bin mean/std.

    ``index_m``/``kappa``: optional exact integer-lattice classification
    (cubic grids): ``index_m = Kx^2+Ky^2+Kz^2`` (exact integers) and
    ``kappa = 2*pi/L``; bin membership is then
    ``searchsorted(ceil((bins/kappa)^2*(1-1e-12)), m, 'right')`` — an
    independent numpy restatement of ``ops.spectra.kbin_thresholds``
    (the library's round-4 dtype-exact binning convention)."""
    pk = (delta_k * np.conj(delta_k)).real / boxfactor
    if kbins is not None:
        bins = np.asarray(kbins)
    else:
        bins = np.logspace(np.log10(kmin), np.log10(kmax), nbins)
    _bins = [0.0] + list(bins)
    cent = [0.5 * (_bins[j + 1] + _bins[j]) for j in range(bins.size)]
    vals = np.zeros(bins.size)
    stddev = np.zeros(bins.size)
    if index_m is not None:
        thr = np.ceil((np.asarray(bins, np.float64) / kappa) ** 2
                      * (1.0 - 1e-12)).astype(np.int64)
        idxs = np.searchsorted(thr, np.asarray(index_m).flatten(),
                               side="right")
    else:
        idxs = np.digitize(k.flatten(), bins)
    pk_flat = pk.flatten()
    for i in range(bins.size):
        sel = idxs == i
        with np.errstate(invalid="ignore"):
            vals[i] = np.mean(pk_flat[sel]) if sel.any() else np.nan
            stddev[i] = (np.std(pk_flat[sel]) / np.sqrt(sel.sum())
                         if sel.any() else np.nan)
    return np.array(cent[1:]), vals[1:], stddev[1:]


def redshift_space_density(delta_x, velocity_z, zgrid, Hz, method="linear"):
    """Per-LOS scipy griddata remap (reference box.py:384-438 semantics)."""
    delta_s = np.zeros_like(delta_x) - 1.0
    length_z = np.max(zgrid) - np.min(zgrid)
    for i in range(delta_x.shape[0]):
        for j in range(delta_x.shape[1]):
            s = zgrid - velocity_z[i, j, :] / Hz
            s = (s - np.min(zgrid)) % length_z + np.min(zgrid)
            fill = 0.5 * (delta_x[i, j, 0] + delta_x[i, j, -1])
            delta_s[i, j, :] = griddata(
                points=(s,), values=delta_x[i, j, :], xi=(zgrid,),
                method=method, fill_value=fill,
            )
    return delta_s


def pca_filter(field, nmodes):
    """Reference-convention PCA clean (filters.py:93-183 semantics)."""
    d = field.reshape((-1, field.shape[-1])).T  # (Nfreq, Npix)
    d_mean = np.mean(d, axis=-1)[:, None]
    x = d - d_mean
    cov = np.cov(x)
    eigvals, eigvecs = np.linalg.eig(cov)
    order = np.argsort(eigvals)[::-1]
    eigvecs = eigvecs[:, order]
    U_fg = eigvecs[:, :nmodes]
    fg_amps = U_fg.T @ x
    fg_field = (U_fg @ fg_amps + d_mean).T.reshape(field.shape)
    return field - fg_field
