"""Test configuration.

Correctness tests run on CPU with 8 virtual devices (for multi-chip sharding
tests) and float64 enabled, so the JAX pipeline can be validated against the
numpy/scipy oracle at tight tolerances.  Benchmarks (bench.py) run on the
real TPU in float32.
"""
import os

# Must be set before jax is imported anywhere.  Force CPU: the driver env may
# preset JAX_PLATFORMS to the TPU platform, but correctness tests always run
# on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin can override the env var; force the platform via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from fastbox_tpu.cosmology import build_cosmology  # noqa: E402


@pytest.fixture(scope="session")
def cosmo_z0():
    """Shared cosmology tables at z=0 (default reference cosmology)."""
    return build_cosmology(dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95,
                                sigma8=0.8), redshift=0.0)


@pytest.fixture(scope="session")
def cosmo_z08():
    return build_cosmology(dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95,
                                sigma8=0.8), redshift=0.8)


@pytest.fixture()
def rng():
    return np.random.default_rng(11)
