"""Instrument and sky models (L4): foregrounds, beams, noise, tracers, halos."""
from . import foregrounds, noise, tracers
from .foregrounds import ForegroundModel, PointSourceModel
from .noise import NoiseModel
from .tracers import HITracer, TracerModel

__all__ = [
    "foregrounds",
    "noise",
    "tracers",
    "ForegroundModel",
    "PointSourceModel",
    "NoiseModel",
    "HITracer",
    "TracerModel",
]
