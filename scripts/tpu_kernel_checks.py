"""Drive the TPU-gated Pallas kernel tests on real hardware.

The CPU test suite (tests/conftest.py) pins JAX_PLATFORMS=cpu, so tests
marked with the tpu-platform skip (e.g. the pltpu.prng_* statistics in
tests/test_pallas_noise.py) never run there.  This runner executes the
same checks against the real backend — run it from the repo root after
touching any PRNG kernel:

    python scripts/tpu_kernel_checks.py
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))

import jax.numpy as jnp
import numpy as np

from fastbox_tpu.ops.pallas.noise import add_scaled_normal_pallas

FAIL = []


def check(name, ok, detail=""):
    print(f"{name:44s} {'PASS' if ok else 'FAIL'} {detail}", flush=True)
    if not ok:
        FAIL.append(name)


def main():
    plat = jax.devices()[0].platform
    print("platform:", plat, flush=True)

    R, C = 512, 128
    x = jnp.ones((R, C), jnp.float32) * 5.0
    scale = jnp.full(C, 2.0, jnp.float32)
    out = np.asarray(add_scaled_normal_pallas(x, scale, 1234))
    noise = (out - 5.0) / 2.0
    n = noise.size
    check("normal mean", abs(noise.mean()) < 5.0 / np.sqrt(n),
          f"mean={noise.mean():.4f}")
    check("normal std", abs(noise.std() - 1.0) < 0.01,
          f"std={noise.std():.4f}")
    check("normal skew", abs(np.mean(noise ** 3)) < 0.05,
          f"m3={np.mean(noise**3):.4f}")
    check("normal kurtosis", abs(np.mean(noise ** 4) - 3.0) < 0.15,
          f"m4={np.mean(noise**4):.4f}")
    # the two Box-Muller half-blocks must be independent across the seam
    top, bot = noise[:R // 2], noise[R // 2:]
    corr = np.corrcoef(top.ravel(), bot.ravel())[0, 1]
    check("half-block independence", abs(corr) < 5.0 / np.sqrt(n / 2),
          f"corr={corr:.4f}")

    a = np.asarray(add_scaled_normal_pallas(x, scale, 42))
    b = np.asarray(add_scaled_normal_pallas(x, scale, 42))
    c = np.asarray(add_scaled_normal_pallas(x, scale, 43))
    check("deterministic per seed", np.array_equal(a, b))
    check("seed sensitivity", not np.array_equal(a, c))

    y, m = add_scaled_normal_pallas(jnp.zeros((512, 128), jnp.float32),
                                    scale, 7, return_max=True)
    check("return_max equals max|out|",
          abs(float(m) - float(jnp.max(jnp.abs(y)))) == 0.0,
          f"m={float(m):.4f}")

    # --- colored half-spectrum draw kernel (ops/pallas/half_draw.py) ---
    from fastbox_tpu.ops.pallas.half_draw import colored_complex_normal_pallas

    R2, C2 = 256, 256
    ampv = np.linspace(0.5, 3.0, C2).astype(np.float32)
    amp = jnp.broadcast_to(jnp.asarray(ampv)[None, :], (R2, C2))
    re, im = colored_complex_normal_pallas(jnp.asarray(amp), 99)
    re, im = np.asarray(re), np.asarray(im)
    # each part carries variance amp^2/2 -> |z|^2 has mean amp^2
    p = re ** 2 + im ** 2
    ratio = p.mean(axis=0) / ampv ** 2
    check("colored draw per-mode power", np.all(np.abs(ratio - 1.0) < 0.4),
          f"maxdev={np.max(np.abs(ratio - 1.0)):.3f}")
    zre = re / (ampv[None, :] / np.sqrt(2.0))
    zim = im / (ampv[None, :] / np.sqrt(2.0))
    check("colored draw unit parts",
          abs(zre.std() - 1.0) < 0.01 and abs(zim.std() - 1.0) < 0.01,
          f"std=({zre.std():.4f},{zim.std():.4f})")
    corr_ri = np.corrcoef(zre.ravel(), zim.ravel())[0, 1]
    check("colored draw re/im independence",
          abs(corr_ri) < 5.0 / np.sqrt(zre.size), f"corr={corr_ri:.4f}")
    re2, im2 = colored_complex_normal_pallas(jnp.asarray(amp), 99)
    re3, _ = colored_complex_normal_pallas(jnp.asarray(amp), 100)
    check("colored draw deterministic per seed",
          np.array_equal(re, np.asarray(re2))
          and np.array_equal(im, np.asarray(im2)))
    check("colored draw seed sensitivity",
          not np.array_equal(re, np.asarray(re3)))
    # Two-word seed path (the production entropy: 64 bits of the jax key
    # survive — gaussian.colored_half_noise passes (2,) int32).  A scalar
    # seed s is zero-extended to (s, 0), so (99,) must reproduce 99, and
    # flipping EITHER word must change the stream.
    rev0, imv0 = colored_complex_normal_pallas(
        jnp.asarray(amp), jnp.asarray([99, 0], jnp.int32))
    rev1, _ = colored_complex_normal_pallas(
        jnp.asarray(amp), jnp.asarray([99, 1], jnp.int32))
    rev2, _ = colored_complex_normal_pallas(
        jnp.asarray(amp), jnp.asarray([98, 0], jnp.int32))
    check("colored draw (s,0) == scalar s",
          np.array_equal(re, np.asarray(rev0))
          and np.array_equal(im, np.asarray(imv0)))
    check("colored draw 2nd seed word sensitivity",
          not np.array_equal(re, np.asarray(rev1)))
    check("colored draw 1st seed word sensitivity",
          not np.array_equal(re, np.asarray(rev2)))

    # end-to-end half-spectrum statistics through colored_half_noise:
    # the irfftn of the colored draw must reproduce the target P(k) std
    from fastbox_tpu.fields.gaussian import colored_half_noise
    from fastbox_tpu.grid import GridSpec

    grid = GridSpec.create(box_scale=(1e3,) * 3, nsamp=128, redshift=0.0)
    ones = jnp.ones((128, 128, 65), jnp.float32)

    # Materialise via a (real, imag) pair: a direct complex host transfer
    # is UNIMPLEMENTED on the axon backend (the round-3 campaign crashed
    # exactly here with 'UNIMPLEMENTED: TPU backend error' on np.asarray
    # of the complex output — the kernel itself was fine).
    @jax.jit
    def _draw_parts(key):
        h = colored_half_noise(key, grid, ones, jnp.float32)
        return jnp.real(h), jnp.imag(h)

    hr, hi = _draw_parts(jax.random.PRNGKey(3))
    hv = np.asarray(hr) + 1j * np.asarray(hi)
    # kz=0 plane must be exactly 2D-Hermitian (conjugate at -i, -j)
    pl0 = hv[:, :, 0]
    rev = np.roll(np.flip(np.roll(np.flip(pl0, 0), 1, 0), 1), 1, 1)
    check("colored draw kz=0 plane Hermitian",
          np.allclose(pl0, np.conj(rev), atol=1e-6))
    # interior modes: unit expected power
    pint = np.abs(hv[:, :, 1:-1]) ** 2
    check("colored draw interior unit power",
          abs(pint.mean() - 1.0) < 0.01, f"mean={pint.mean():.4f}")

    if FAIL:
        print("KERNEL CHECKS FAILED:", FAIL, flush=True)
        sys.exit(1)
    print("all kernel checks pass", flush=True)


if __name__ == "__main__":
    main()
