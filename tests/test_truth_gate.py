"""Truth-anchoring knobs: an f64 pipeline consuming the exact f32 stream.

``PipelineConfig(draw_dtype='float32', threefry_noise=True)`` is the
infrastructure behind scripts/truth_gate.py: jax.random draws are
dtype-dependent, so without draw injection an f64 run is a different
realisation and can only be compared statistically (CLAUDE.md).  These
tests pin the contract that makes per-bin oracle comparisons valid.
"""
import dataclasses

import jax
import numpy as np
import pytest

from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.pipeline import PipelineConfig, make_pipeline

N = 32


@pytest.fixture(scope="module")
def setup():
    grid = GridSpec.create(box_scale=(2e3,) * 3, nsamp=N, redshift=0.8)
    cosmo = build_cosmology(
        dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8),
        redshift=0.8,
    )
    return grid, cosmo


def _gate_cfg(dtype):
    return PipelineConfig(dtype=dtype, draw_dtype="float32",
                          threefry_noise=True)


def test_injected_draws_match_across_dtypes(setup):
    """The f64 oracle and the f32 run see the SAME realisation: the
    pre-PCA density spectrum (pure compute, no conditioning
    amplification) must agree to f32 roundoff, not just statistically."""
    grid, cosmo = setup
    key = jax.random.PRNGKey(77)
    out64 = make_pipeline(grid, cosmo, _gate_cfg("float64"))(key)
    out32 = make_pipeline(grid, cosmo, _gate_cfg("float32"))(key)
    t = np.asarray(out64["pk_density"], np.float64)
    f = np.asarray(out32["pk_density"], np.float64)
    good = np.isfinite(t) & (t > 0)
    assert np.max(np.abs(f[good] - t[good]) / t[good]) < 1e-5
    s64 = float(out64["sigma_data"])
    s32 = float(out32["sigma_data"])
    assert abs(s32 - s64) / s64 < 1e-5
    # The cleaned spectrum exists and is finite in the shared bins
    c64 = np.asarray(out64["pk_cleaned"])[good]
    c32 = np.asarray(out32["pk_cleaned"])[good]
    assert np.all(np.isfinite(c64)) and np.all(np.isfinite(c32))


def test_without_injection_realisations_differ(setup):
    """Control: with dtype-native draws the f64 run is a DIFFERENT
    realisation (documents why draw_dtype exists at all)."""
    grid, cosmo = setup
    key = jax.random.PRNGKey(77)
    cfg64 = dataclasses.replace(_gate_cfg("float64"), draw_dtype=None)
    out64 = make_pipeline(grid, cosmo, cfg64)(key)
    out32 = make_pipeline(grid, cosmo, _gate_cfg("float32"))(key)
    t = np.asarray(out64["pk_density"], np.float64)
    f = np.asarray(out32["pk_density"], np.float64)
    good = np.isfinite(t) & (t > 0)
    # Different stream -> sample-variance-level differences, ~O(10%)
    assert np.max(np.abs(f[good] - t[good]) / t[good]) > 1e-3


def test_default_config_unaffected_by_gate_fields(setup):
    """draw_dtype=None + threefry_noise=False is the shipping path: the
    gate fields at their defaults must reproduce it bit-for-bit."""
    grid, cosmo = setup
    key = jax.random.PRNGKey(3)
    base = make_pipeline(grid, cosmo, PipelineConfig())(key)
    explicit = make_pipeline(
        grid, cosmo,
        PipelineConfig(draw_dtype=None, threefry_noise=False))(key)
    np.testing.assert_array_equal(np.asarray(base["pk_cleaned"]),
                                  np.asarray(explicit["pk_cleaned"]))
