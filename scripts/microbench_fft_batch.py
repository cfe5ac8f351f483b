"""Is a batched irfftn pair cheaper than two separate irfftns on TPU?

The 256^3 pipeline's FFT floor is ~15 ms across three transforms
(pipeline.py: irfftn(delta_k), irfftn(vz_k), rfftn(cleaned)).  The first
two are independent once vz_k is formed, so XLA could in principle run
them as one batched transform.  This measures whether that helps.
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


def bench(name, f, *args, n=20):
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name:38s} {(time.perf_counter() - t0) / n * 1000:8.2f} ms",
          flush=True)


N = 256
H = N // 2 + 1
key = jax.random.PRNGKey(0)
a = (jax.random.normal(key, (N, N, H)) + 1j * jax.random.normal(key, (N, N, H))).astype(jnp.complex64)
b = (a * 1j).astype(jnp.complex64)

two = jax.jit(lambda a, b: (jnp.fft.irfftn(a, s=(N, N, N)),
                            jnp.fft.irfftn(b, s=(N, N, N))))
stacked = jax.jit(lambda a, b: jnp.fft.irfftn(jnp.stack([a, b]), s=(N, N, N),
                                              axes=(1, 2, 3)))
bench("2x irfftn separate", two, a, b)
bench("1x irfftn batched (stack)", stacked, a, b)

x = jax.random.normal(key, (N, N, N), jnp.float32)
y = x * 2.0
two_f = jax.jit(lambda x, y: (jnp.fft.rfftn(x), jnp.fft.rfftn(y)))
st_f = jax.jit(lambda x, y: jnp.fft.rfftn(jnp.stack([x, y]), axes=(1, 2, 3)))
bench("2x rfftn separate", two_f, x, y)
bench("1x rfftn batched (stack)", st_f, x, y)
