"""Probe Mosaic (Pallas TPU) capabilities needed by the factored-DFT kernel.

Answers, on real hardware:
  1. does ``lax.dot_general(..., precision=HIGHEST)`` inside a kernel give
     ~f32 accuracy (the compiler emitting the multi-pass bf16 scheme)?
  2. do sublane-slice butterflies + stack/reshape interleaves lower?
  3. what do the dense vs (4,128)-factored in-kernel DFT cost on a
     (512, 128) f32 tile pair, HBM-resident at (R, C) scale?

Run from the repo root: python scripts/probe_mosaic_dft.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 512
LB = 128
HI = jax.lax.Precision.HIGHEST


def _dense_kernel(wr_ref, wi_ref, xr_ref, xi_ref, yr_ref, yi_ref):
    wr, wi = wr_ref[:], wi_ref[:]
    xr, xi = xr_ref[0], xi_ref[0]
    yr_ref[0] = (jnp.dot(wr, xr, precision=HI, preferred_element_type=jnp.float32)
                 - jnp.dot(wi, xi, precision=HI, preferred_element_type=jnp.float32))
    yi_ref[0] = (jnp.dot(wr, xi, precision=HI, preferred_element_type=jnp.float32)
                 + jnp.dot(wi, xr, precision=HI, preferred_element_type=jnp.float32))


def _fact_kernel(w2r_ref, w2i_ref, tr_ref, ti_ref, xr_ref, xi_ref,
                 yr_ref, yi_ref, *, n1: int, n2: int):
    xr, xi = xr_ref[0], xi_ref[0]          # (C, LB)
    # stage 1: radix-n1 butterflies over j1-major sublane blocks
    xs_r = [xr[k * n2:(k + 1) * n2] for k in range(n1)]
    xs_i = [xi[k * n2:(k + 1) * n2] for k in range(n1)]
    if n1 == 2:
        ar = [xs_r[0] + xs_r[1], xs_r[0] - xs_r[1]]
        ai = [xs_i[0] + xs_i[1], xs_i[0] - xs_i[1]]
    elif n1 == 4:
        # sign = -1 (forward): A1 = t1 - i u1, A3 = t1 + i u1
        t0r, t0i = xs_r[0] + xs_r[2], xs_i[0] + xs_i[2]
        t1r, t1i = xs_r[0] - xs_r[2], xs_i[0] - xs_i[2]
        u0r, u0i = xs_r[1] + xs_r[3], xs_i[1] + xs_i[3]
        u1r, u1i = xs_r[1] - xs_r[3], xs_i[1] - xs_i[3]
        ar = [t0r + u0r, t1r + u1i, t0r - u0r, t1r - u1i]
        ai = [t0i + u0i, t1i - u1r, t0i - u0i, t1i + u1r]
    else:
        raise ValueError(n1)
    # twiddle (per k1 row-block) then stage 2: one (n2,n2) dot per k1
    w2r, w2i = w2r_ref[:], w2i_ref[:]
    outs = []
    for k1 in range(n1):
        tr = tr_ref[k1 * n2:(k1 + 1) * n2]   # (n2, 1)
        ti = ti_ref[k1 * n2:(k1 + 1) * n2]
        br = ar[k1] * tr - ai[k1] * ti
        bi = ar[k1] * ti + ai[k1] * tr
        yr = (jnp.dot(w2r, br, precision=HI, preferred_element_type=jnp.float32)
              - jnp.dot(w2i, bi, precision=HI, preferred_element_type=jnp.float32))
        yi = (jnp.dot(w2r, bi, precision=HI, preferred_element_type=jnp.float32)
              + jnp.dot(w2i, br, precision=HI, preferred_element_type=jnp.float32))
        outs.append((yr, yi))
    # interleave: out[k2*n1 + k1] = Y_k1[k2]
    yr_full = jnp.stack([o[0] for o in outs], axis=1).reshape(C, LB)
    yi_full = jnp.stack([o[1] for o in outs], axis=1).reshape(C, LB)
    yr_ref[0] = yr_full
    yi_ref[0] = yi_full


def run_dense(xr, xi, wr, wi, R3):
    grid = (R3,)
    return pl.pallas_call(
        _dense_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, LB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, LB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, LB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, LB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((R3, C, LB), jnp.float32)] * 2,
    )(wr, wi, xr, xi)


def run_fact(xr, xi, w2r, w2i, tr, ti, R3, n1, n2):
    grid = (R3,)
    return pl.pallas_call(
        partial(_fact_kernel, n1=n1, n2=n2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, LB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, LB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, LB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, LB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((R3, C, LB), jnp.float32)] * 2,
    )(w2r, w2i, tr, ti, xr, xi)


def main():
    R3 = int(os.environ.get("R3", "1028"))  # 512*257/128 -> full-scale HBM
    n1, n2 = 4, C // 4
    rng = np.random.default_rng(0)
    x = rng.standard_normal((R3, C, LB)).astype(np.float32) \
        + 1j * rng.standard_normal((R3, C, LB)).astype(np.float32)
    # reference: DFT over the middle (sublane) axis
    ref = np.fft.fft(x[:2], axis=1)

    W = np.exp(-2j * np.pi * np.outer(np.arange(C), np.arange(C)) / C)
    wr = jnp.asarray(W.real, jnp.float32)
    wi = jnp.asarray(W.imag, jnp.float32)
    j1 = np.arange(n1)
    W2 = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    # twiddle W_C^(k1*j2), k1-major rows (C,1)
    T = np.exp(-2j * np.pi
               * (np.repeat(j1, n2) * np.tile(np.arange(n2), n1)) / C)
    w2r = jnp.asarray(W2.real, jnp.float32)
    w2i = jnp.asarray(W2.imag, jnp.float32)
    tr = jnp.asarray(T.real, jnp.float32).reshape(C, 1)
    ti = jnp.asarray(T.imag, jnp.float32).reshape(C, 1)

    xr = jnp.asarray(x.real)
    xi = jnp.asarray(x.imag)

    f_dense = jax.jit(lambda a, b: run_dense(a, b, wr, wi, R3))
    f_fact = jax.jit(lambda a, b: run_fact(a, b, w2r, w2i, tr, ti, R3, n1, n2))

    for name, f in (("dense", f_dense), ("fact(4,128)", f_fact)):
        try:
            t0 = time.perf_counter()
            yr, yi = f(xr, xi)
            got = np.asarray(yr[:2]) + 1j * np.asarray(yi[:2])
            tc = time.perf_counter() - t0
            err = np.abs(got - ref).max() / np.abs(ref).max()
            t0 = time.perf_counter()
            for _ in range(5):
                yr, yi = f(xr, xi)
            np.asarray(yr[:1, :1, :1])
            dt = (time.perf_counter() - t0) / 5
            gb = R3 * C * LB * 4 * 4 / 1e9
            print(f"{name:12s} err={err:.2e}  {dt*1000:7.2f} ms  "
                  f"({gb/dt:.0f} GB/s eff)  compile {tc:.1f}s", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
