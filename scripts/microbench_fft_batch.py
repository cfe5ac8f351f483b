"""Is a batched irfftn pair cheaper than two separate irfftns on TPU?

The 256^3 pipeline's FFT floor is ~15 ms across three transforms
(pipeline.py: irfftn(delta_k), irfftn(vz_k), rfftn(cleaned)).  The first
two are independent once vz_k is formed, so XLA could in principle run
them as one batched transform.  This measures whether that helps.

Measurement method: ``jax.block_until_ready`` returns early through the
axon tunnel (CLAUDE.md), so each variant is CHAINED k times inside one jit
with real data dependencies, and a scalar is read back to force execution.
The per-iteration time difference between variants isolates the
separate-vs-batched irfftn pair; each iteration also contains one rfftn
(the chain link), identical across variants.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 256
H = N // 2 + 1
K = 8  # chained iterations per program


def chain(pairfn):
    """x -> repeat K times: a=rfftn(x); (y1,y2)=pairfn(a); x=y1+y2."""

    @jax.jit
    def f(x, w1, w2):
        for _ in range(K):
            a = jnp.fft.rfftn(x)
            y1, y2 = pairfn(a, w1, w2)
            x = y1 + y2
            x = x * jnp.float32(0.5 / jnp.max(jnp.abs(x)))  # keep finite
        return jnp.sum(x)

    return f


def pair_separate(a, w1, w2):
    return (jnp.fft.irfftn(a * w1, s=(N, N, N)),
            jnp.fft.irfftn(a * w2, s=(N, N, N)))


def pair_batched(a, w1, w2):
    st = jnp.stack([a * w1, a * w2])
    y = jnp.fft.irfftn(st, s=(N, N, N), axes=(1, 2, 3))
    return y[0], y[1]


def timeit(name, f, *args, n=3):
    out = f(*args)
    float(out)  # force compile + first run
    t0 = time.perf_counter()
    for _ in range(n):
        float(f(*args))
    dt = (time.perf_counter() - t0) / (n * K)
    print(f"{name:32s} {dt * 1000:8.3f} ms per rfftn+irfftn-pair iter",
          flush=True)
    return dt


def main():
    # Independent keys for every draw: re/im parts of each weight field
    # come from DISTINCT subkeys so the complex inputs are full-rank
    # generic, not degenerate (round-1 advisor finding).
    kx, k1r, k1i, k2r, k2i = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(kx, (N, N, N), jnp.float32)
    kz = jnp.asarray(np.fft.rfftfreq(N).astype(np.float32))
    w1 = (jax.random.normal(k1r, (N, N, H), jnp.float32)
          + 1j * jax.random.normal(k1i, (N, N, H), jnp.float32)) \
        * jnp.exp(-kz**2)[None, None, :]
    w2 = (jax.random.normal(k2r, (N, N, H), jnp.float32)
          + 1j * jax.random.normal(k2i, (N, N, H), jnp.float32)) \
        * (1j * kz)[None, None, :]

    t_sep = timeit("separate irfftn pair", chain(pair_separate), x, w1, w2)
    t_bat = timeit("batched irfftn pair", chain(pair_batched), x, w1, w2)
    print(f"batched/separate = {t_bat / t_sep:.3f}")


if __name__ == "__main__":
    main()
