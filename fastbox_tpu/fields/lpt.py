"""Lagrangian perturbation theory displacement fields (1LPT + 2LPT).

Setup for the COLA realisation engine (fields/cola.py), replacing the
reference's external pycola3 Cython dependency (box.py:463-589).  All
operators are k-space multiplies + FFTs, jit-compatible.

Conventions: the displacement potentials solve
    lap(phi1) = -delta          psi1 = grad(phi1)  (Zel'dovich)
    lap(phi2) = -S2,  S2 = sum_{i<j} [phi1_ii phi1_jj - phi1_ij^2]
    psi2 = grad(phi2)
so positions are x = q + D1 psi1 + D2 psi2 with D2(a) ~ -3/7 D1^2
Omega_m(a)^(-1/143) (Bouchet et al. 1995).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from ..ops import fft_safe

from ..grid import GridSpec

__all__ = ["lpt_displacements", "second_order_growth"]


def _inv_k2(grid: GridSpec, dtype):
    k2 = grid.k2(dtype)
    return jnp.where(k2 > 0.0, 1.0 / jnp.where(k2 > 0.0, k2, 1.0), 0.0)


def _gradient(phi_k, kvecs, nyq_mask):
    """ifftn(i k_i phi_k) per axis -> (3, N, N, N) real.

    The most-negative-frequency (Nyquist) plane of each derivative axis is
    zeroed for even N — the ik multiply cannot represent a real derivative
    there (same convention as the reference's velocity field,
    box.py:268-274).
    """
    kx, ky, kz = kvecs
    gxk = jnp.where(nyq_mask[:, None, None], 0.0, 1j * kx[:, None, None] * phi_k)
    gyk = jnp.where(nyq_mask[None, :, None], 0.0, 1j * ky[None, :, None] * phi_k)
    gzk = jnp.where(nyq_mask[None, None, :], 0.0, 1j * kz[None, None, :] * phi_k)
    gx = fft_safe.ifftn(gxk).real
    gy = fft_safe.ifftn(gyk).real
    gz = fft_safe.ifftn(gzk).real
    return jnp.stack([gx, gy, gz])


@partial(jax.jit, static_argnames=("grid",))
def lpt_displacements(delta_k, grid: GridSpec):
    """1LPT and 2LPT displacement fields from a linear density field.

    Parameters:
        delta_k: Fourier-space linear overdensity (z=0 normalisation —
            growth factors are applied by the caller).

    Returns:
        (psi1, psi2): two (3, N, N, N) real displacement fields on the
        Lagrangian grid.
    """
    rdtype = jnp.real(delta_k).dtype
    kvecs = grid.kvec(rdtype)
    kx, ky, kz = kvecs
    inv_k2 = _inv_k2(grid, rdtype)
    nyq = grid.nyquist_mask(0)

    phi1_k = delta_k * inv_k2  # lap phi1 = -delta  =>  phi1_k = delta_k / k^2
    psi1 = _gradient(phi1_k, kvecs, nyq)

    # Second derivatives phi1_ij = ifftn(-k_i k_j phi1_k)
    kk = {
        "xx": kx[:, None, None] * kx[:, None, None],
        "yy": ky[None, :, None] * ky[None, :, None],
        "zz": kz[None, None, :] * kz[None, None, :],
        "xy": kx[:, None, None] * ky[None, :, None],
        "xz": kx[:, None, None] * kz[None, None, :],
        "yz": ky[None, :, None] * kz[None, None, :],
    }
    d = {key: fft_safe.ifftn(-val * phi1_k).real for key, val in kk.items()}

    S2 = (d["xx"] * d["yy"] - d["xy"] ** 2
          + d["xx"] * d["zz"] - d["xz"] ** 2
          + d["yy"] * d["zz"] - d["yz"] ** 2)
    phi2_k = fft_safe.fftn(S2) * inv_k2
    psi2 = _gradient(phi2_k, kvecs, nyq)
    return psi1, psi2


def second_order_growth(D1, omega_m_a):
    """D2(a) ~ -3/7 D1^2 Omega_m(a)^(-1/143) (Bouchet et al. 1995)."""
    return -3.0 / 7.0 * D1**2 * omega_m_a ** (-1.0 / 143.0)
