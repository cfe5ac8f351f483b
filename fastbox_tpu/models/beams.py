"""Instrumental beam models (L4).

Reference: ``fastbox/beams.py``.  The per-channel 2D convolutions
(beams.py:63-135) — a scipy ``fftconvolve`` per frequency slice and a very
slow direct ``convolve2d`` loop — become batched FFT convolutions over the
whole cube at once on device.

Beam families:
  * ``BeamModel`` — unit beam base class (beams.py:13-135).
  * ``GaussianBeamModel`` — Airy-approximating Gaussian beam,
    FWHM = 1.22 lambda/D (the standard single-dish model the reference's
    examples emulate with transfer functions).
  * ``KatBeamModel`` — MeerKAT JimBeam via the optional ``katbeam`` package
    (beams.py:139-236), plus a dependency-free ``CosineBeamModel``
    implementing the same cosine-tapered illumination formula.
  * ``ZernikeBeamModel`` — Zernike-polynomial beam (beams.py:239-946).  The
    reference unrolls 66 polynomials by hand; here they are generated from
    the closed-form radial sum for any OSA/ANSI index.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from ..ops import fft_safe
import numpy as np

from ..constants import C_MS

__all__ = [
    "convolve_fft_cube",
    "convolve_wrap_cube",
    "BeamModel",
    "GaussianBeamModel",
    "CosineBeamModel",
    "KatBeamModel",
    "ZernikeBeamModel",
    "zernike_eval",
]


# ----------------------------------------------------------------------
# Convolution primitives (batched over frequency)
# ----------------------------------------------------------------------
@jax.jit
def convolve_fft_cube(beam, field):
    """Per-channel linear FFT convolution, 'same' cropping (beams.py:63-87).

    Matches ``scipy.signal.fftconvolve(beam, field, mode='same',
    axes=[0,1])`` followed by the reference's per-channel normalisation by
    the beam sum.  Zero-padded (aperiodic) convolution, cropped to the
    centre like scipy's 'same'.
    """
    n0, n1, _ = field.shape
    m0, m1, _ = beam.shape
    f0, f1 = n0 + m0 - 1, n1 + m1 - 1
    B = fft_safe.rfft2(beam, s=(f0, f1), axes=(0, 1))
    F = fft_safe.rfft2(field, s=(f0, f1), axes=(0, 1))
    full = fft_safe.irfft2(B * F, s=(f0, f1), axes=(0, 1))
    s0, s1 = (f0 - n0) // 2, (f1 - n1) // 2
    out = full[s0:s0 + n0, s1:s1 + n1, :]
    norm = jnp.sum(beam.reshape(-1, beam.shape[-1]), axis=0)
    return out / norm[None, None, :]


@jax.jit
def convolve_wrap_cube(beam, field):
    """Per-channel *circular* convolution, matching
    ``scipy.signal.convolve2d(beam, field, mode='same', boundary='wrap')``
    per slice (beams.py:90-135), normalised by the beam sum.

    Circular convolution via FFT, rolled so the output alignment matches
    convolve2d's 'same' centring (offset (N-1)//2 per axis).
    """
    n0, n1, _ = field.shape
    B = fft_safe.fft2(beam, axes=(0, 1))
    F = fft_safe.fft2(field, axes=(0, 1))
    circ = fft_safe.ifft2(B * F, axes=(0, 1)).real
    out = jnp.roll(circ, shift=(-((n0 - 1) // 2), -((n1 - 1) // 2)),
                   axis=(0, 1))
    norm = jnp.sum(beam.reshape(-1, beam.shape[-1]), axis=0)
    return out / norm[None, None, :]


# ----------------------------------------------------------------------
# Beam models
# ----------------------------------------------------------------------
class BeamModel:
    """Unit beam (beams.py:13-61)."""

    def __init__(self, box):
        self.box = box

    def beam_cube(self, pol=None):
        n = self.box.N
        return jnp.ones((n, n, n))

    def beam_value(self, x, y, freq, pol=None):
        assert x.shape == y.shape == freq.shape, \
            "x, y, and freq arrays should have the same shape"
        return 1.0 + 0.0 * x

    def convolve_fft(self, field_x, pol=None):
        """FFT-convolve a cube with the beam, per channel (beams.py:63-87)."""
        return convolve_fft_cube(self.beam_cube(pol=pol), jnp.asarray(field_x))

    def convolve_real(self, field_x, pol=None, verbose=False):
        """Wrap-boundary convolution (beams.py:90-135), done via FFT —
        mathematically identical to the reference's direct loop."""
        return convolve_wrap_cube(self.beam_cube(pol=pol), jnp.asarray(field_x))

    # Shared helper
    def _angle_freq_mesh(self):
        ang_x, ang_y = self.box.pixel_array()
        freqs = self.box.freq_array()
        # np.meshgrid default (xy) indexing, as the reference uses
        return np.meshgrid(ang_x, ang_y, freqs)


class GaussianBeamModel(BeamModel):
    """Gaussian beam with FWHM = 1.22 lambda / D (D in metres)."""

    def __init__(self, box, dish_diameter: float):
        super().__init__(box)
        self.D = dish_diameter

    def beam_value(self, x, y, freq, pol=None):
        lam = C_MS / (np.asarray(freq) * 1e6)
        fwhm_deg = np.degrees(1.22 * lam / self.D)
        sigma = fwhm_deg / (2.0 * np.sqrt(2.0 * np.log(2.0)))
        r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
        return jnp.exp(-0.5 * r2 / sigma**2)

    def beam_cube(self, pol=None):
        x, y, nu = self._angle_freq_mesh()
        return self.beam_value(x, y, nu, pol=pol)


class CosineBeamModel(BeamModel):
    """Cosine-tapered-illumination beam (the JimBeam functional form).

    b(theta) = [cos(1.189 pi theta / theta_b) / (1 - 4 (1.189 theta/theta_b)^2)]^2
    with theta_b the FWHM ~ 1.22 lambda/D; the standard analytic model for
    MeerKAT-like dishes (Mauch et al. 2020, eq. 3), usable without the
    optional ``katbeam`` dependency.
    """

    def __init__(self, box, dish_diameter: float = 13.5):
        super().__init__(box)
        self.D = dish_diameter

    def beam_value(self, x, y, freq, pol="I"):
        lam = C_MS / (np.asarray(freq) * 1e6)
        theta_b = np.degrees(1.22 * lam / self.D)  # FWHM, deg
        r = np.sqrt(np.asarray(x) ** 2 + np.asarray(y) ** 2)
        u = 1.189 * r / theta_b
        num = jnp.cos(jnp.pi * u)
        den = 1.0 - 4.0 * u**2
        den = jnp.where(jnp.abs(den) < 1e-7, 1e-7 * jnp.sign(den + 1e-30), den)
        return (num / den) ** 2

    def beam_cube(self, pol="I"):
        x, y, nu = self._angle_freq_mesh()
        return self.beam_value(x, y, nu, pol=pol)


class KatBeamModel(BeamModel):
    """MeerKAT JimBeam via the optional katbeam package (beams.py:139-236)."""

    def __init__(self, box, model="L"):
        try:
            import katbeam
        except ImportError as exc:
            raise ImportError(
                "Unable to import `katbeam`; please install from "
                "https://github.com/ska-sa/katbeam"
            ) from exc
        super().__init__(box)
        self.avail_models = {"L": "MKAT-AA-L-JIM-2020",
                             "UHF": "MKAT-AA-UHF-JIM-2020"}
        if model not in self.avail_models:
            raise ValueError(
                f"model '{model}' not found. Options are: "
                f"{list(self.avail_models)}")
        self.model = model
        self.beam = katbeam.JimBeam(self.avail_models[model])

    def _eval(self, x, y, nu, pol):
        assert pol in ["I", "HH", "VV"], f"Unknown polarisation '{pol}'"
        if pol == "HH":
            return self.beam.HH(x, y, nu)
        if pol == "VV":
            return self.beam.VV(x, y, nu)
        return self.beam.I(x, y, nu)

    def beam_cube(self, pol="I"):
        x, y, nu = self._angle_freq_mesh()
        return self._eval(x, y, nu, pol)

    def beam_value(self, x, y, freq, pol="I"):
        assert x.shape == y.shape == freq.shape
        return self._eval(x, y, freq, pol)


# ----------------------------------------------------------------------
# Zernike polynomials (closed form, any index)
# ----------------------------------------------------------------------
def _osa_to_nm(j: int):
    """OSA/ANSI single index -> (n, m)."""
    n = int((-3 + math.sqrt(9 + 8 * j)) // 2)
    m = 2 * j - n * (n + 2)
    return n, m


def zernike_eval(coeffs, x, y):
    """Sum of Zernike polynomials on the unit disc (OSA/ANSI ordering).

    Replaces the reference's hand-unrolled 66-term table
    (beams.py:308-946) with the closed-form radial sum
    R_n^|m|(rho) = sum_k (-1)^k (n-k)! / (k! ((n+|m|)/2-k)! ((n-|m|)/2-k)!)
    rho^(n-2k).  Points outside the unit disc evaluate to 0.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    rho = jnp.sqrt(x**2 + y**2)
    theta = jnp.arctan2(y, x)
    inside = rho <= 1.0

    out = jnp.zeros_like(rho)
    for j, c in enumerate(np.atleast_1d(coeffs)):
        if c == 0.0:
            continue
        n, m = _osa_to_nm(j)
        am = abs(m)
        R = jnp.zeros_like(rho)
        for k in range((n - am) // 2 + 1):
            coef = ((-1) ** k * math.factorial(n - k)
                    / (math.factorial(k)
                       * math.factorial((n + am) // 2 - k)
                       * math.factorial((n - am) // 2 - k)))
            R = R + coef * rho ** (n - 2 * k)
        if m > 0:
            Z = R * jnp.cos(am * theta)
        elif m < 0:
            Z = R * jnp.sin(am * theta)
        else:
            Z = R
        out = out + float(c) * Z
    return jnp.where(inside, out, 0.0)


class ZernikeBeamModel(BeamModel):
    """Zernike-expansion beam (beams.py:239-946)."""

    def __init__(self, box, coeffs):
        super().__init__(box)
        self.coeffs = np.asarray(coeffs, dtype=np.float64)

    def beam_value(self, x, y, freq=None, pol=None):
        xcos = jnp.sin(jnp.asarray(x) * jnp.pi / 180.0)
        ycos = jnp.sin(jnp.asarray(y) * jnp.pi / 180.0)
        return self.zernike(self.coeffs, xcos, ycos)

    def beam_cube(self, pol=None):
        x, y, nu = self._angle_freq_mesh()
        return self.beam_value(x, y, nu, pol=pol)

    def zernike(self, coeffs, x, y):
        return zernike_eval(coeffs, x, y)
