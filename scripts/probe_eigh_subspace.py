#!/usr/bin/env python
"""Standalone probe: how accurate is the TPU's f32 ``eigh`` top-subspace
on a foreground-like covariance, vs CPU f32 and the f64 truth?

Motivation (round 4): every 256^3 truth-gate variant shows the same
systematic +4e-3 low-bin bias on the cleaned P(k), invariant to DFT
weight precision (HIGH / HIGHEST / SPLIT) — pointing at the PCA clean
itself.  Foreground leakage from a misaligned top-``m`` eigenspace adds
POSITIVE power ~ sin^2(theta) * (FG/signal), matching the signature.

This probe fabricates a covariance with the measured FG dynamic range
(lambda_1/lambda_4 ~ 1e6+, lambda_4 degenerate-ish with the noise
floor), then measures the principal angle between the top-m subspace of:
  * numpy f64 eigh (truth)
  * numpy f32 eigh (the CPU floor's eigh)
  * jnp eigh f32 on the active backend (TPU when run there)

Run once with JAX_PLATFORMS=cpu and once on the TPU.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def subspace_sin(U, V):
    """max principal-angle sine between equal-rank orthonormal bases."""
    # sin(theta_max) = ||(I - UU^T) V||_2
    R = V - U @ (U.T @ V)
    return float(np.linalg.svd(R, compute_uv=False)[0])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_fastbox"))

    m = 4
    if "--real" in sys.argv:
        # Real pipeline covariance captured by scripts/probe_capture_cov.py
        path = sys.argv[sys.argv.index("--real") + 1]
        cov64 = np.load(path)["cov"].astype(np.float64)
        C = cov64.shape[0]
        lam = np.linalg.eigvalsh(cov64)[::-1]
        print(f"REAL covariance {path}: C={C}, "
              f"l1/l4={lam[0]/lam[3]:.3g}, l4/l5={lam[3]/lam[4]:.5g}")
    else:
        rng = np.random.default_rng(7)
        C = 256
        # Smooth FG-like eigenvectors: low-order polynomials in frequency,
        # orthonormalised; the rest random.
        nu = np.linspace(0.0, 1.0, C)
        cols = [nu**p for p in range(8)] + [rng.standard_normal(C)
                                            for _ in range(C - 8)]
        Q, _ = np.linalg.qr(np.stack(cols, axis=1))
        # FG dynamic range ~1e6 over the top 4, then a near-degenerate noise
        # floor: lambda_4 = 1.0 vs floor 0.95 (the hard case CLAUDE.md notes).
        lam = np.concatenate([
            [1e6, 3e4, 5e2, 1.0],
            0.95 * np.exp(-0.01 * np.arange(C - m)),
        ])
        cov64 = (Q * lam) @ Q.T
        cov64 = 0.5 * (cov64 + cov64.T)

    w64, v64 = np.linalg.eigh(cov64)
    U_true = v64[:, ::-1][:, :m]

    w32, v32 = np.linalg.eigh(cov64.astype(np.float32))
    U_cpu32 = v32[:, ::-1][:, :m].astype(np.float64)

    dev = jax.devices()[0].platform
    wj, vj = jnp.linalg.eigh(jnp.asarray(cov64.astype(np.float32)))
    U_dev = np.asarray(vj)[:, ::-1][:, :m].astype(np.float64)

    # (0) The cheapest possible fix: TPU eigh is matmul-based (QDWH /
    # Jacobi sweeps lowered to GEMMs) — if those GEMMs run at DEFAULT
    # (bf16 single-pass) the subspace is junk for the same reason the
    # round-3 truth gate demoted the PCA covariance GEMMs.  Test eigh
    # under the highest matmul-precision context.
    with jax.default_matmul_precision("highest"):
        wj_hi, vj_hi = jax.jit(jnp.linalg.eigh)(
            jnp.asarray(cov64.astype(np.float32)))
    U_dev_hi = np.asarray(vj_hi)[:, ::-1][:, :m].astype(np.float64)
    print(f"device-f32 eigh under default_matmul_precision('highest'): "
          f"sin={subspace_sin(U_true, U_dev_hi):.3e}")

    s_cpu = subspace_sin(U_true, U_cpu32)
    s_dev = subspace_sin(U_true, U_dev)
    # Leakage power fraction ~ sin^2(theta) weighted by the FG power the
    # misalignment lets through; report the raw subspace angles.
    print(f"platform={dev}")
    print(f"sin(theta_max) top-{m}: numpy-f32={s_cpu:.3e}  "
          f"device-f32={s_dev:.3e}")
    # Also each mode's eigenvalue relative error on device
    wj_ = np.asarray(wj)[::-1][:m]
    print("top eigval rel err (device f32):",
          np.abs(wj_ - lam[:m]) / lam[:m])

    # ---- refinement candidates -------------------------------------
    # (A) Is the true top-m inside the DEVICE eigh's top-p span?  If so,
    # a p-dim Rayleigh-Ritz with an accurate small solver recovers it.
    for p in (8, 16, 32):
        Qp = np.asarray(vj)[:, ::-1][:, :p].astype(np.float64)
        print(f"  span(dev top-{p}) contains true top-{m}: "
              f"sin={subspace_sin(Qp, U_true):.3e}")

    # (B) Hybrid: device top-p span -> B = Q^T C Q in f32 (as the device
    # would) -> accurate small eigh (stand-in for an on-device Jacobi)
    # -> top-m.  Measured against truth.
    for p in (8, 16, 32):
        Qp = np.asarray(vj)[:, ::-1][:, :p].astype(np.float64)
        # re-orthonormalise (device vectors are only f32-orthonormal)
        Qp, _ = np.linalg.qr(Qp)
        B = (Qp.T @ cov64.astype(np.float32).astype(np.float64) @ Qp
             ).astype(np.float32)
        _, Vb = np.linalg.eigh(B.astype(np.float64))
        Um = Qp @ Vb[:, ::-1][:, :m]
        print(f"  RR(p={p}) top-{m}: sin={subspace_sin(U_true, Um):.3e}")

    # (C) Same with ONE power-iteration heal of the span first.
    for p in (8, 16):
        Qp = np.asarray(vj)[:, ::-1][:, :p].astype(np.float64)
        Y = cov64.astype(np.float32).astype(np.float64) @ Qp
        Qp, _ = np.linalg.qr(Y)
        B = (Qp.T @ cov64.astype(np.float32).astype(np.float64) @ Qp
             ).astype(np.float32)
        _, Vb = np.linalg.eigh(B.astype(np.float64))
        Um = Qp @ Vb[:, ::-1][:, :m]
        print(f"  power+RR(p={p}) top-{m}: "
              f"sin={subspace_sin(U_true, Um):.3e}")

    # (D) Invariant-subspace Newton refinement, f32 arithmetic throughout
    # (emulating the on-device implementation): seed with the device eigh
    # basis; per iteration rotate the top-m block to its Ritz vectors,
    # then apply the first-order correction X_ij = B_ij/(a_j - e_i) in
    # the CURRENT orthogonal complement basis, and re-orthonormalise.
    C32 = cov64.astype(np.float32)
    V0 = np.asarray(vj)[:, ::-1].astype(np.float32)  # descending order
    for iters in (1, 2, 3, 4):
        Vm = V0[:, :m].copy()
        Vr = V0[:, m:].copy()
        for _ in range(iters):
            W = (C32 @ Vm).astype(np.float32)            # (C, m)
            A = Vm.T @ W                                  # (m, m)
            wa, Ga = np.linalg.eigh(A.astype(np.float64))  # tiny: Jacobi
            Ga = Ga[:, ::-1].astype(np.float32)
            a = wa[::-1].astype(np.float32)
            Vm = Vm @ Ga
            W = W @ Ga
            Bm = Vr.T @ W                                 # (C-m, m)
            e = np.einsum("ij,ij->j", Vr, C32 @ Vr)       # diag Ritz
            X = Bm / (a[None, :] - e[:, None])
            Vnew = Vm + Vr @ X
            # re-orthonormalise the pair (QR of (C, m) + complement fix)
            Vm, _ = np.linalg.qr(Vnew)
            Vr = Vr - Vm @ (Vm.T @ Vr)
            Vr, _ = np.linalg.qr(Vr)
            Vm = Vm.astype(np.float32)
            Vr = Vr.astype(np.float32)
        print(f"  newton(iters={iters}) top-{m}: "
              f"sin={subspace_sin(U_true, Vm.astype(np.float64)):.3e}")


if __name__ == "__main__":
    main()
