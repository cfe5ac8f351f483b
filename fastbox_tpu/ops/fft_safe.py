"""Self-validating FFT facade: native XLA where it is correct, MXU
matmul DFTs (ops/mmfft.py) where the backend's transform is broken or
unimplemented.

Why this exists (measured 2026-08-17 on the axon TPU backend):

* The native FFT implements ONLY unbatched rank-3 R2C/C2R transforms —
  every C2C, every 1D/2D transform, and every leading-batch-dim config
  raises ``UNIMPLEMENTED``, and a failed op POISONS the process's TPU
  client (all later ops fail).  So those configs are routed straight to
  the matmul implementation on non-CPU platforms, never probed.
* The native C2R is DETERMINISTICALLY WRONG — ~0.33 broadband relative
  error — at several cube sizes (256, 260, 288, 384, 512 broken; 240,
  252, 320 and below 256 correct).  Forward R2C measured correct
  everywhere probed.  With a rolling backend upgrade behind the tunnel
  this cannot be assumed per size or per session, so the one natively
  *runnable* config (rank-3 cube R2C/C2R) is accuracy-probed on first
  use of each (platform, shape, dtype): one jitted program transforms a
  seeded random cube both ways and the native result is used only where
  it agrees with the matmul result (dense linear algebra, cross-checked
  against numpy in tests/test_mmfft.py).

On CPU everything is native XLA (pocketfft) — tests and oracles see
bit-identical behavior to before.

Only the call patterns used in this package are supported (see each
function's docstring), not the full numpy.fft surface.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from . import mmfft

__all__ = ["rfftn", "irfftn", "fftn", "ifftn", "fft", "ifft",
           "rfft", "irfft", "fft2", "ifft2", "rfft2", "irfft2",
           "native_fft_ok", "matmul_only"]

# Disagreement below this (relative, max-norm) counts as "agreeing":
# well above f32 FFT roundoff (~5e-7), far below the observed 0.33 bug.
_TOL = 1e-4

_FORCE_MM = 0


class matmul_only:
    """Trace-time context forcing the matmul path off CPU.

    Needed when transforms will acquire a batch dimension the caller
    can't see here — e.g. tracing the pipeline under ``vmap`` turns its
    rank-3 cube FFTs into batched FFTs, which the native backend cannot
    run at all.  Wrap the vmapped trace:

        with fft_safe.matmul_only():
            out = jax.vmap(single)(keys)

    No effect on CPU (native XLA handles every config there).
    """

    def __enter__(self):
        global _FORCE_MM
        _FORCE_MM += 1
        return self

    def __exit__(self, *exc):
        global _FORCE_MM
        _FORCE_MM -= 1
        return False


def _is_cpu():
    return jax.default_backend() == "cpu"


# Off-CPU: route even the probed-OK cube transforms to the matmul DFTs.
# The matmul forward measured FASTER than the native forward at 256^3
# (2.2 vs 3.0 ms); flip this to trade a little accuracy headroom
# (matmul ~3e-5 vs native ~5e-7 relative) for throughput.
PREFER_MM = False


def _native_allowed():
    return _is_cpu() or not (_FORCE_MM or PREFER_MM)


@lru_cache(maxsize=64)
def native_fft_ok(platform: str, shape: tuple, dtype_name: str):
    """(forward_ok, inverse_ok) for the native rank-3 cube R2C/C2R.

    One jitted probe compares native vs matmul transforms of a seeded
    random cube; the native inverse is checked as a roundtrip against
    the probe input itself (through the matmul forward).
    """
    if platform == "cpu":
        return True, True
    dtype = jnp.dtype(dtype_name)

    @jax.jit
    def probe(key):
        x = jax.random.normal(key, shape, dtype)
        a_mm = mmfft.rfftn3(x)
        a_nat = jnp.fft.rfftn(x)
        fdiff = jnp.max(jnp.abs(a_nat - a_mm)) / jnp.max(jnp.abs(a_mm))
        xs = jnp.max(jnp.abs(x))
        idiff = jnp.max(jnp.abs(jnp.fft.irfftn(a_mm, s=shape) - x)) / xs
        mm_rt = jnp.max(jnp.abs(mmfft.irfftn3(a_mm, shape) - x)) / xs
        return fdiff, idiff, mm_rt

    try:
        fdiff, idiff, mm_rt = (float(v) for v in probe(jax.random.PRNGKey(7)))
    except Exception:
        return False, False  # native rank-3 itself unrunnable here
    if mm_rt > _TOL:
        raise RuntimeError(
            f"matmul FFT roundtrip failed its own probe at {shape}: "
            f"{mm_rt:.3e} — refusing to guess which FFT is correct")
    return bool(fdiff < _TOL), bool(idiff < _TOL)


def _cube_ok(shape, dtype_name):
    return native_fft_ok(jax.default_backend(),
                         tuple(int(v) for v in shape), dtype_name)


# ---------------------------------------------------------------------
# rank-3 R2C/C2R on a full cube: the one natively-runnable config
# ---------------------------------------------------------------------
def rfftn(x, axes=None, precision=None):
    """``jnp.fft.rfftn``.  Probed native for the full-rank 3D case;
    matmul DFTs for partial-axes or non-3D inputs off CPU.

    ``precision`` overrides the matmul-DFT einsum precision for THIS
    transform only (None inherits the mmfft module default); it has no
    effect when the native FFT is used.
    """
    if axes is None and x.ndim == 3:
        if _native_allowed():
            fwd_ok, _ = _cube_ok(x.shape, jnp.dtype(x.dtype).name)
            if fwd_ok:
                return jnp.fft.rfftn(x)
        return mmfft.rfftn3(x, precision=precision)
    axes = tuple(range(x.ndim)) if axes is None else tuple(axes)
    if _is_cpu():
        return jnp.fft.rfftn(x, axes=axes)
    return mmfft.rfftn_any(x, axes, precision=precision)


def irfftn(a, s, axes=None, precision=None):
    """``jnp.fft.irfftn(a, s=s, axes=axes)`` (s is required here).

    ``precision`` as in :func:`rfftn`.
    """
    s = tuple(int(v) for v in s)
    if axes is None and a.ndim == 3 and len(s) == 3:
        if _native_allowed():
            rname = "float64" if a.dtype == jnp.complex128 else "float32"
            _, inv_ok = _cube_ok(s, rname)
            if inv_ok:
                return jnp.fft.irfftn(a, s=s)
        return mmfft.irfftn3(a, s, precision=precision)
    axes = tuple(range(a.ndim)) if axes is None else tuple(axes)
    if _is_cpu():
        return jnp.fft.irfftn(a, s=s, axes=axes)
    return mmfft.irfftn_any(a, s[-1], axes, precision=precision)


# ---------------------------------------------------------------------
# C2C — natively unrunnable off CPU, matmul DFTs there
# ---------------------------------------------------------------------
def fftn(x, axes=None):
    if _is_cpu():
        return jnp.fft.fftn(x, axes=axes)
    return mmfft.fftn(x, axes)


def ifftn(x, axes=None):
    if _is_cpu():
        return jnp.fft.ifftn(x, axes=axes)
    return mmfft.ifftn(x, axes)


def fft(x, axis=-1, precision=None):
    if _is_cpu():
        return jnp.fft.fft(x, axis=axis)
    return mmfft.fft(x, axis, precision=precision)


def ifft(x, axis=-1, precision=None):
    if _is_cpu():
        return jnp.fft.ifft(x, axis=axis)
    return mmfft.ifft(x, axis, precision=precision)


def fft2(x, axes=(-2, -1)):
    return fftn(x, axes=tuple(axes))


def ifft2(x, axes=(-2, -1)):
    return ifftn(x, axes=tuple(axes))


# ---------------------------------------------------------------------
# 1D / 2D real transforms — natively unrunnable off CPU
# ---------------------------------------------------------------------
def rfft(x, axis=-1, precision=None):
    if _is_cpu():
        return jnp.fft.rfft(x, axis=axis)
    return mmfft.rfft(x, axis, precision=precision)


def irfft(a, n, axis=-1, precision=None):
    if _is_cpu():
        return jnp.fft.irfft(a, n=n, axis=axis)
    return mmfft.irfft(a, int(n), axis, precision=precision)


def _pad_to(x, s, axes):
    pads = [(0, 0)] * x.ndim
    need = False
    for n, ax in zip(s, axes):
        cur = x.shape[ax]
        if n != cur:
            assert n > cur, "fft_safe: s smaller than input not supported"
            pads[ax] = (0, n - cur)
            need = True
    return jnp.pad(x, pads) if need else x


def rfft2(x, s=None, axes=(-2, -1)):
    """``jnp.fft.rfft2`` with optional zero-padding to ``s``."""
    axes = tuple(ax % x.ndim for ax in axes)
    if s is not None:
        x = _pad_to(x, s, axes)
    if _is_cpu():
        return jnp.fft.rfft2(x, axes=axes)
    return mmfft.rfftn_any(x, axes)


def irfft2(a, s, axes=(-2, -1)):
    axes = tuple(ax % a.ndim for ax in axes)
    if _is_cpu():
        return jnp.fft.irfft2(a, s=s, axes=axes)
    return mmfft.irfftn_any(a, int(s[-1]), axes)
