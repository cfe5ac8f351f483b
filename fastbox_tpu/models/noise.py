"""Radiometer-equation instrumental noise (L4).

Matches the reference's ``NoiseModel.realise_radiometer_noise``
(reference noise.py:25-75): frequency-dependent sky temperature
T_sky = 60 K (nu/300 MHz)^-2.5, per-channel RMS from the radiometer
equation, white noise scaled per frequency slice.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["radiometer_sigma", "realise_radiometer_noise", "NoiseModel"]


def radiometer_sigma(freqs_mhz, ang_x_deg, Tinst, tp, fov, Ndish):
    """Per-channel noise RMS sigma(nu) in mK (noise.py:53-70). Host-side numpy.

    Parameters:
        freqs_mhz: frequency channels (MHz), e.g. from GridSpec.freq_array.
        ang_x_deg: angular pixel coordinates (deg), from GridSpec.pixel_array.
        Tinst: instrument temperature in Kelvin.
        tp: integration time per pointing, hours.
        fov: field of view in deg^2.
        Ndish: number of dishes.
    """
    freqs = np.asarray(freqs_mhz, dtype=np.float64)
    dnu = np.abs(freqs[1] - freqs[0])       # MHz
    tp_sec = tp * 3600.0                     # hrs -> sec (noise.py:58)
    dtheta = ang_x_deg[1] - ang_x_deg[0]     # deg
    t_res = tp_sec * dtheta**2 / fov         # sec per resolution element
    Tsky = 60e3 * (freqs / 300.0) ** (-2.5)  # mK (noise.py:66)
    Tsys = Tinst * 1e3 + Tsky                # mK
    return Tsys / np.sqrt(Ndish * t_res * (dnu * 1e6))  # dnu in Hz (noise.py:70)


@partial(jax.jit, static_argnames=("grid", "dtype"))
def realise_radiometer_noise(key, grid, sigma_rms, dtype=jnp.float32):
    """White noise cube scaled by per-channel sigma(nu) (noise.py:73-74)."""
    sigma = jnp.asarray(sigma_rms, dtype=dtype)
    noise = jax.random.normal(key, grid.shape, dtype=dtype)
    return noise * sigma[None, None, :]


class NoiseModel:
    """Reference-API shim (noise.py:11-75)."""

    def __init__(self, box):
        self.box = box

    def realise_radiometer_noise(self, Tinst, tp, fov, Ndish, redshift=None):
        box = self.box
        cosmology = box.cosmology_at(redshift)
        freqs = box.grid.freq_array(cosmology)
        ang_x, _ = box.grid.pixel_array(cosmology)
        sigma = radiometer_sigma(freqs, ang_x, Tinst, tp, fov, Ndish)
        return realise_radiometer_noise(box.next_key(), box.grid, sigma,
                                        dtype=box.dtype)
