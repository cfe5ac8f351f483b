import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fastbox")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def bench(name, f, *args, n=5):
    t0=time.perf_counter(); o=f(*args); jax.block_until_ready(o); tc=time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(n): o=f(*args)
    jax.block_until_ready(o)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:8.1f} ms (compile {tc:.1f}s)", flush=True)
    return o

key = jax.random.PRNGKey(0)
R, C = 65536, 256
s = jax.random.uniform(key, (R, C))
v = jax.random.normal(key, (R, C))
z = jnp.linspace(0, 1, C)

# sort variants
# argsort+gather variant skipped: pathological compile (the thing we are replacing)
bench("lax.sort_key_val", jax.jit(lambda s,v: jax.lax.sort_key_val(s, v)), s, v)

ss, vv = jax.lax.sort_key_val(s, v)
# searchsorted variants
bench("vmapped searchsorted", jax.jit(lambda ss: jax.vmap(lambda a: jnp.searchsorted(a, z, side='right'))(ss)), ss)
bench("comparison-sum idx", jax.jit(lambda ss: jnp.sum(ss[:,:,None] <= z[None,None,:], axis=1)), ss)
idx = jnp.clip(jnp.sum(ss[:,:,None] <= z[None,None,:], axis=1), 1, C-1)
# gather variants
bench("take_along_axis", jax.jit(lambda vv,idx: jnp.take_along_axis(vv, idx, axis=1)), vv, idx)
bench("onehot matmul gather", jax.jit(lambda vv,idx: jnp.einsum('rc,rct->rt', vv, jax.nn.one_hot(idx, C, axis=1, dtype=vv.dtype))), vv, idx)

# interp variants (P(k) coloring): 16.7M points into 8192 table
N=256
x = jax.random.uniform(key, (N,N,N), minval=-11., maxval=6.9)
tab_x = jnp.linspace(-11.6, 7.0, 8192)
tab_y = jnp.sin(tab_x)
bench("jnp.interp 256^3", jax.jit(lambda x: jnp.interp(x, tab_x, tab_y)), x)
def uniform_interp(x):
    x0, dx = tab_x[0], tab_x[1]-tab_x[0]
    f = (x - x0)/dx
    i = jnp.clip(f.astype(jnp.int32), 0, 8190)
    w = f - i
    return tab_y[i]*(1-w) + tab_y[i+1]*w
bench("uniform-grid interp 256^3", jax.jit(uniform_interp), x)
