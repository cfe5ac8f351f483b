"""TPU microbenchmark: MXU matmul FFTs (ops/mmfft.py) vs the native FFT.

The axon backend's native FFT handles only unbatched rank-3 rfftn/irfftn
(CLAUDE.md), so the pipeline currently pays for three separate rank-3
transforms per realisation.  mmfft can (a) fuse the (delta_x, vel_z)
inverse pair into ONE complex transform and (b) run any batched/C2C shape.
This measures whether the MXU route is actually faster at 256^3, and at
which einsum precision the f32 accuracy bar (~1e-4) holds.

Timing: ``block_until_ready`` returns early through the tunnel, so each
variant chains K iterations inside one jit with data dependencies and
reads back a scalar (CLAUDE.md).

Run from the repo root:  python scripts/microbench_mmfft.py --nsamp 256
"""
import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(name, fn, args, K, n=3):
    out = fn(*args)
    np.asarray(out)  # compile + first run, hard host sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / (n * K)
    print(f"{name:36s} {dt * 1000:8.3f} ms/iter", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsamp", type=int, default=256)
    ap.add_argument("--K", type=int, default=8)
    args = ap.parse_args()
    N, K = args.nsamp, args.K
    H = N // 2 + 1

    from fastbox_tpu.ops import mmfft

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, N, N), jnp.float32)
    ah = jnp.fft.rfftn(x)

    # --- accuracy first (one shot vs native, which is the shipping path)
    for prec_name in ("DEFAULT", "HIGH", "HIGHEST"):
        mmfft._PREC = getattr(jax.lax.Precision, prec_name)

        @jax.jit
        def pair(ah):
            return mmfft.irfftn_pair(ah, ah * jnp.complex64(0.5), (N, N, N))

        ga, gb = pair(ah)
        ref = jnp.fft.irfftn(ah, s=(N, N, N))
        err_a = float(jnp.max(jnp.abs(ga - ref)) / jnp.max(jnp.abs(ref)))
        err_b = float(jnp.max(jnp.abs(gb - 0.5 * ref))
                      / jnp.max(jnp.abs(ref)))
        print(f"accuracy {prec_name:8s}: pair rel err = {err_a:.2e} / "
              f"{err_b:.2e}", flush=True)

    # --- timing: native baselines
    @jax.jit
    def nat_inv(ah):
        y = ah
        for _ in range(K):
            r = jnp.fft.irfftn(y, s=(N, N, N))
            y = y * (1.0 + 1e-12 * jnp.mean(r))
        return jnp.mean(r)

    @jax.jit
    def nat_fwd(x):
        y = x
        for _ in range(K):
            a = jnp.fft.rfftn(y)
            y = y * (1.0 + 1e-12 * jnp.mean(jnp.real(a)))
        return jnp.mean(jnp.abs(a[0, 0, :2]))

    timed("native irfftn (1 transform)", nat_inv, (ah,), K)
    timed("native rfftn  (1 transform)", nat_fwd, (x,), K)

    for prec_name in ("DEFAULT", "HIGH", "HIGHEST"):
        mmfft._PREC = getattr(jax.lax.Precision, prec_name)

        @jax.jit
        def mm_pair(ah):
            y = ah
            for _ in range(K):
                ra, rb = mmfft.irfftn_pair(y, y * jnp.complex64(0.5),
                                           (N, N, N))
                y = y * (1.0 + 1e-12 * jnp.mean(ra + rb))
            return jnp.mean(ra)

        @jax.jit
        def mm_fwd(x):
            y = x
            for _ in range(K):
                a = mmfft.rfftn_via_cfft(y)
                y = y * (1.0 + 1e-12 * jnp.mean(jnp.real(a)))
            return jnp.mean(jnp.abs(a[0, 0, :2]))

        timed(f"mmfft inverse PAIR ({prec_name})", mm_pair, (ah,), K)
        timed(f"mmfft forward rfftn ({prec_name})", mm_fwd, (x,), K)


def bench_half(nsamp=256, K=8):
    """Timing + host-truth accuracy for rfftn3/irfftn3 at each precision."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fastbox_tpu.ops import mmfft
    N, H = nsamp, nsamp // 2 + 1
    rng = np.random.default_rng(7)
    xh = rng.standard_normal((N, N, N)).astype(np.float32)
    ah = np.fft.rfftn(xh).astype(np.complex64)
    ad = jax.jit(jax.lax.complex)(jnp.asarray(ah.real.copy()),
                                  jnp.asarray(ah.imag.copy()))
    xd = jnp.asarray(xh)

    for prec in ("HIGH", "HIGHEST"):
        mmfft._PREC = getattr(jax.lax.Precision, prec)
        y = jax.jit(lambda a: mmfft.irfftn3(a, (N, N, N)))(ad)
        e_inv = np.abs(np.asarray(y) - xh).max() / np.abs(xh).max()
        g = jax.jit(mmfft.rfftn3)(xd)
        gh = np.asarray(jnp.real(g)) + 1j * np.asarray(jnp.imag(g))
        e_fwd = np.abs(gh - ah).max() / np.abs(ah).max()
        print(f"accuracy {prec}: irfftn3 {e_inv:.2e}  rfftn3 {e_fwd:.2e}",
              flush=True)

        @jax.jit
        def inv_chain(a):
            y = a
            for _ in range(K):
                r = mmfft.irfftn3(y, (N, N, N))
                y = y * (1.0 + 1e-12 * jnp.mean(r))
            return jnp.mean(r)

        @jax.jit
        def fwd_chain(x):
            y = x
            for _ in range(K):
                a = mmfft.rfftn3(y)
                y = y * (1.0 + 1e-12 * jnp.mean(jnp.real(a)))
            return jnp.mean(jnp.abs(jnp.real(a[0, 0, :2])))

        timed(f"mmfft irfftn3 ({prec})", inv_chain, (ad,), K)
        timed(f"mmfft rfftn3  ({prec})", fwd_chain, (xd,), K)


def _splits_for(n: int):
    """Candidate stage splits for a length-n DFT, dense first."""
    cands = [(n,)]
    for a in (2, 4, 8, 16, 32, 64, 128):
        if n % a == 0 and 1 < n // a <= 256:
            cands.append((a, n // a))
    return [c for c in cands if int(np.prod(c)) == n]


def bench_factors(nsamp=256, K=8):
    """Sweep FACTOR_OVERRIDES x precision for rfftn3/irfftn3 at ``nsamp``.

    Accuracy is a device-side roundtrip (x -> rfftn3 -> irfftn3 vs x), so
    only scalars cross the tunnel; timing chains K transforms per program.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fastbox_tpu.ops import mmfft
    N = nsamp
    x = jax.random.normal(jax.random.PRNGKey(3), (N, N, N), jnp.float32)

    # Optional filters: MM_SPLITS="512;2,256;4,128" MM_PRECS="HIGHEST"
    want = os.environ.get("MM_SPLITS")
    splits = (_splits_for(N) if not want else
              [tuple(int(v) for v in s.split(",")) for s in want.split(";")])
    precs = tuple(os.environ.get("MM_PRECS", "HIGH,HIGHEST").split(","))
    for split in splits:
        assert int(np.prod(split)) == N, split
        mmfft.FACTOR_OVERRIDES[N] = split
        for prec in precs:
            mmfft.set_precision(prec)

            @jax.jit
            def rt_err(x):
                a = mmfft.rfftn3(x)
                y = mmfft.irfftn3(a, (N, N, N))
                return jnp.max(jnp.abs(y - x)) / jnp.max(jnp.abs(x))

            err = float(rt_err(x))

            @jax.jit
            def chain(x):
                y = x
                for _ in range(K):
                    a = mmfft.rfftn3(y)
                    r = mmfft.irfftn3(a, (N, N, N))
                    y = y * 0.5 + r * 0.5
                return jnp.mean(y)

            dt = timed(f"split={split} {prec}: rfftn3+irfftn3", chain,
                       (x,), K)
            print(f"    roundtrip rel err {err:.2e}", flush=True)
    mmfft.FACTOR_OVERRIDES.pop(N, None)


if __name__ == "__main__":
    if os.environ.get("MM_HALF"):
        bench_half()
    elif os.environ.get("MM_FACTORS"):
        bench_factors(int(os.environ.get("MM_NSAMP", "256")),
                      K=int(os.environ.get("MM_K", "8")))
    else:
        main()
