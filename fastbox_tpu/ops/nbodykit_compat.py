"""nbodykit-style convenience wrappers over the native estimators.

Every reference example drives its estimation through nbodykit's
``ArrayMesh`` / ``ArrayCatalog.to_mesh`` / ``FFTPower`` / ``FFTCorr``
(SURVEY.md §2.3).  These thin classes mirror that call surface so reference
scripts port with minimal edits, while everything executes on device through
:mod:`fastbox_tpu.ops.spectra` and :mod:`fastbox_tpu.ops.painting`.

Results are exposed nbodykit-style: ``FFTPower(...).power`` is a dict-like
with 'k', 'power', 'modes' (plus 'power_0/2/4' for poles), and
``FFTCorr(...).corr`` with 'r', 'corr'.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..grid import GridSpec
from . import painting, spectra

__all__ = ["ArrayMesh", "ArrayCatalog", "FFTPower", "FFTCorr"]


class ArrayMesh:
    """A field on a periodic box (nbodykit ArrayMesh analog)."""

    def __init__(self, field, BoxSize):
        self.field = jnp.asarray(field)
        if np.isscalar(BoxSize):
            BoxSize = (float(BoxSize),) * 3
        self.BoxSize = tuple(float(b) for b in BoxSize)
        n = self.field.shape[0]
        self.grid = GridSpec(N=n, Lx=self.BoxSize[0], Ly=self.BoxSize[1],
                             Lz=self.BoxSize[2])


class ArrayCatalog:
    """A particle catalogue (nbodykit ArrayCatalog analog).

    ``data`` is a dict with a 'Position' key of shape (Np, 3), positions in
    [0, L) comoving coordinates.
    """

    def __init__(self, data):
        self.data = {k: jnp.asarray(v) for k, v in data.items()}

    def to_mesh(self, Nmesh, BoxSize, window="tsc", compensated=True,
                interlaced=False, position="Position"):
        """Paint onto a mesh with the given assignment window; returns an
        ArrayMesh of the (optionally compensated, optionally interlaced)
        overdensity."""
        if np.isscalar(BoxSize):
            BoxSize = (float(BoxSize),) * 3
        grid = GridSpec(N=int(Nmesh), Lx=BoxSize[0], Ly=BoxSize[1],
                        Lz=BoxSize[2])
        delta = painting.overdensity_from_catalogue(
            self.data[position], grid, window=window, compensated=compensated,
            interlaced=bool(interlaced))
        return ArrayMesh(delta, BoxSize)


class _Result(dict):
    """Attribute+item access result container (nbodykit-ish)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as exc:
            raise AttributeError(name) from exc


def _as_mesh(obj):
    if isinstance(obj, ArrayMesh):
        return obj
    raise TypeError("first argument must be an ArrayMesh (or use to_mesh)")


class FFTPower:
    """FFT-based P(k) / P(k,mu) / multipole estimator (FFTPower analog).

    Parameters follow nbodykit: mode '1d' or '2d', optional ``poles``,
    linear bins of width ``dk`` from ``kmin``, and an arbitrary ``los``
    3-vector (default z axis, the only LOS the reference uses).
    """

    def __init__(self, first, mode="1d", Nmu=5, dk=None, kmin=0.0,
                 poles=(), second=None, los=(0, 0, 1)):
        mesh = _as_mesh(first)
        los = tuple(float(v) for v in los)
        second_f = second.field if isinstance(second, ArrayMesh) else second

        self.attrs = {"mode": mode, "dk": dk, "kmin": kmin,
                      "BoxSize": mesh.BoxSize, "los": los}
        if poles:
            res = spectra.power_multipoles(mesh.grid, mesh.field,
                                           second=second_f,
                                           poles=tuple(poles), dk=dk,
                                           kmin=kmin, los=los)
            self.poles = _Result({k: np.asarray(v) for k, v in res.items()})
        else:
            self.poles = None
        nmu = Nmu if mode == "2d" else 1
        res = spectra.power_spectrum(mesh.grid, mesh.field, second=second_f,
                                     dk=dk, kmin=kmin, nmu=nmu, los=los)
        self.power = _Result({k: np.asarray(v) for k, v in res.items()})


class FFTCorr:
    """FFT-based correlation-function estimator (FFTCorr analog)."""

    def __init__(self, first, mode="1d", dr=2.0, rmin=0.0, rmax=None,
                 poles=(), second=None, los=(0, 0, 1)):
        mesh = _as_mesh(first)
        los = tuple(float(v) for v in los)
        second_f = second.field if isinstance(second, ArrayMesh) else second

        self.attrs = {"mode": mode, "dr": dr, "BoxSize": mesh.BoxSize,
                      "los": los}
        if poles:
            res = spectra.correlation_multipoles(mesh.grid, mesh.field,
                                                 second=second_f,
                                                 poles=tuple(poles), dr=dr,
                                                 rmin=rmin, rmax=rmax,
                                                 los=los)
            self.poles = _Result({k: np.asarray(v) for k, v in res.items()})
        else:
            self.poles = None
        res = spectra.correlation_function(mesh.grid, mesh.field,
                                           second=second_f, dr=dr, rmin=rmin,
                                           rmax=rmax)
        self.corr = _Result({k: np.asarray(v) for k, v in res.items()})
