"""fastbox_tpu — a TPU-native cosmological field simulation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of philbull/FastBox
(see SURVEY.md): Gaussian/log-normal density fields coloured by a tabulated
matter power spectrum, velocity/potential fields, tracer biasing,
redshift-space distortions, anisotropic filtering, beams, foregrounds, noise,
foreground cleaning, halo sampling, and on-device P(k)/correlation-function
estimation — designed as jit-compiled pipelines sharded over TPU meshes.
"""
__version__ = "0.1.0"


def ensure_platform():
    """Re-assert ``JAX_PLATFORMS`` through the jax config.

    The axon TPU PJRT plugin can override the env var, so
    ``JAX_PLATFORMS=cpu python script.py`` may still initialize the TPU
    backend (and hang if the tunnel is down).  Call this before the first
    jax operation; a no-op when the env var is unset.
    """
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


from . import analysis, cosmology, fields, filters, grid, io, models, ops
from . import parallel, timing, utils
from .box import CosmoBox, default_cosmo
from .cosmology import CosmoParams, build_cosmology
from .grid import GridSpec

# Reference-style module aliases (`fastbox.tracers`, `fastbox.filters`, ...)
from .models import foregrounds, noise, tracers

__all__ = [
    "CosmoBox",
    "default_cosmo",
    "CosmoParams",
    "build_cosmology",
    "GridSpec",
    "cosmology",
    "fields",
    "grid",
    "models",
    "ops",
    "foregrounds",
    "noise",
    "tracers",
]
