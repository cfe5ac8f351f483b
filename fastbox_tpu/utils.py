"""Survey-geometry utilities (reference fastbox/utils.py)."""
from __future__ import annotations

import numpy as np

from .constants import LINE_FREQ_21CM
from .cosmology import as_cosmo_params, background as bg

__all__ = ["comoving_dimensions_from_survey"]


def comoving_dimensions_from_survey(cosmo, angular_extent, freq_range=None,
                                    z_range=None, line_freq=LINE_FREQ_21CM):
    """Survey (angular extent, freq/z range) -> (zc, (Lx, Ly, Lz)) in Mpc.

    Matches reference utils.py:8-67: the transverse extent is evaluated at
    the comoving centroid redshift of the volume.
    """
    params = as_cosmo_params(cosmo)
    if (freq_range is not None and z_range is not None) or (
            freq_range is None and z_range is None):
        raise ValueError("Must specify either freq_range of z_range.")
    assert len(angular_extent) == 2, "angular_extent must be tuple of length 2"

    if freq_range is not None:
        assert len(freq_range) == 2, "freq_range must be tuple of length 2"
        z_range = (line_freq / freq_range[0] - 1.0,
                   line_freq / freq_range[1] - 1.0)
    assert len(z_range) == 2, "z_range must be tuple of length 2"
    zmin, zmax = sorted(z_range)

    rmin = bg.comoving_radial_distance(params, 1.0 / (1.0 + zmin))
    rmax = bg.comoving_radial_distance(params, 1.0 / (1.0 + zmax))
    Lz = rmax - rmin

    _z = np.linspace(zmin, zmax, 100)
    _r = bg.comoving_radial_distance(params, 1.0 / (1.0 + _z))
    rc = 0.5 * (rmax + rmin)
    zc = float(np.interp(rc, _r, _z))

    r_trans = bg.comoving_angular_distance(params, 1.0 / (1.0 + zc))
    Lx = angular_extent[0] * np.pi / 180.0 * r_trans
    Ly = angular_extent[1] * np.pi / 180.0 * r_trans
    return zc, (Lx, Ly, Lz)
