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

    if FAIL:
        print("KERNEL CHECKS FAILED:", FAIL, flush=True)
        sys.exit(1)
    print("all kernel checks pass", flush=True)


if __name__ == "__main__":
    main()
