"""Pallas factored-DFT kernel (ops/pallas/mmdft.py) vs numpy.

Runs the kernel in interpreter mode on the CPU backend (conftest forces
JAX_PLATFORMS=cpu) over both axes, both signs, both supported radix
splits, and a ragged (non-128-multiple) minor axis.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastbox_tpu.ops.pallas.mmdft import (dft_c2c_axis_pallas,
                                          supported_length)


@pytest.mark.parametrize("C", [256, 512])
@pytest.mark.parametrize("axis", [0, 1])
@pytest.mark.parametrize("sign", [-1, +1])
def test_dft_matches_numpy(C, axis, sign, rng):
    shape = [6, 8, 40]
    shape[axis] = C
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape))
    xr = jnp.asarray(x.real, jnp.float32)
    xi = jnp.asarray(x.imag, jnp.float32)

    yr, yi = dft_c2c_axis_pallas(xr, xi, axis, sign,
                                 inverse_scale=(sign > 0), interpret=True)
    got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
    x32 = np.asarray(xr, np.float64) + 1j * np.asarray(xi, np.float64)
    ref = (np.fft.fft(x32, axis=axis) if sign < 0
           else np.fft.ifft(x32, axis=axis))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 2e-6


def test_dft_ragged_minor_axis(rng):
    """M = 257 (the rfft half-axis at 512^3) is not a lane multiple."""
    x = (rng.standard_normal((256, 4, 257))
         + 1j * rng.standard_normal((256, 4, 257)))
    xr = jnp.asarray(x.real, jnp.float32)
    xi = jnp.asarray(x.imag, jnp.float32)
    yr, yi = dft_c2c_axis_pallas(xr, xi, 0, -1, interpret=True)
    got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
    x32 = np.asarray(xr, np.float64) + 1j * np.asarray(xi, np.float64)
    ref = np.fft.fft(x32, axis=0)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6


def test_roundtrip_and_supported(rng):
    assert supported_length(256) and supported_length(512)
    assert supported_length(1024)
    assert not supported_length(120) and not supported_length(64)
    x = (rng.standard_normal((512, 8, 16))
         + 1j * rng.standard_normal((512, 8, 16)))
    xr = jnp.asarray(x.real, jnp.float32)
    xi = jnp.asarray(x.imag, jnp.float32)
    fr, fi = dft_c2c_axis_pallas(xr, xi, 0, -1, interpret=True)
    br, bi = dft_c2c_axis_pallas(fr, fi, 0, +1, inverse_scale=True,
                                 interpret=True)
    assert float(jnp.max(jnp.abs(br - xr))) < 2e-4
    assert float(jnp.max(jnp.abs(bi - xi))) < 2e-4


def test_rfftn3_irfftn3_pallas_path(rng, monkeypatch):
    """The mmfft rank-3 wrappers route leading axes through the kernel
    (call-counted, per the round-1 advisor lesson) and match numpy."""
    from fastbox_tpu.ops import mmfft
    from fastbox_tpu.ops.pallas import mmdft

    calls = []
    orig = mmdft.dft_c2c_axis_pallas

    def spy(*a, **kw):
        calls.append(kw.get("interpret"))
        return orig(*a, **kw)

    monkeypatch.setattr(mmfft, "PALLAS_DFT", True)
    monkeypatch.setattr(mmfft, "_PALLAS_INTERPRET", True)
    monkeypatch.setattr(mmdft, "dft_c2c_axis_pallas", spy)

    N = 256
    x = rng.standard_normal((N, N, N)).astype(np.float32)
    ref = np.fft.rfftn(np.asarray(x, np.float64))

    a = mmfft.rfftn3(jnp.asarray(x))
    assert len(calls) == 2, "forward must route both leading axes"
    got = np.asarray(jnp.real(a), np.float64) \
        + 1j * np.asarray(jnp.imag(a), np.float64)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6

    y = mmfft.irfftn3(a, (N, N, N))
    assert len(calls) == 4, "inverse must route both leading axes"
    assert np.abs(np.asarray(y, np.float64) - x).max() < 2e-4


def test_rfftn3_axis0_planar_fallback(rng, monkeypatch):
    """Leading axes longer than 256 keep axis 1 on the kernel and run
    axis 0 through the planar direct-einsum fallback (VMEM budget)."""
    from fastbox_tpu.ops import mmfft
    from fastbox_tpu.ops.pallas import mmdft

    calls = []
    orig = mmdft.dft_c2c_axis_pallas

    def spy(xr, xi, axis, *a, **kw):
        calls.append(axis)
        return orig(xr, xi, axis, *a, **kw)

    monkeypatch.setattr(mmfft, "PALLAS_DFT", True)
    monkeypatch.setattr(mmfft, "_PALLAS_INTERPRET", True)
    monkeypatch.setattr(mmdft, "dft_c2c_axis_pallas", spy)

    x = rng.standard_normal((512, 256, 64)).astype(np.float32)
    a = mmfft.rfftn_any(jnp.asarray(x), (0, 1, 2))
    assert calls == [1], "only axis 1 may use the kernel at C0=512"
    ref = np.fft.rfftn(np.asarray(x, np.float64))
    got = np.asarray(jnp.real(a), np.float64) \
        + 1j * np.asarray(jnp.imag(a), np.float64)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6

    y = mmfft.irfftn_any(a, 64, (0, 1, 2))
    assert calls == [1, 1]
    assert np.abs(np.asarray(y, np.float64) - x).max() < 2e-4
