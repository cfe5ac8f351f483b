"""COLA displacement probe — the 256^3 growth-suppression puzzle (CLAUDE.md).

Runs the *shipped, validated* engine (lattice CIC + exact-scatter cond
fallback) with diagnostics on, logging per force evaluation:

  * max wrapped Lagrangian displacement (cells)
  * fraction of displacement components beyond ``lattice_B``
  * which cond branch actually ran (lattice vs exact scatter)

plus the end-state health check (large-scale P(k)/P_lin, field std).  The
hypothesis under test: at 256^3/4Gpc the late steps genuinely exceed every
tested band, so lattice-only reworks (any B in 2..6) mishandle the
out-of-band particles while the healthy engine silently falls back to the
exact scatter path.

Run on the TPU from the repo root (no PYTHONPATH):
    python scripts/probe_cola_disp.py --nsamp 256 --box 4000
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path.home() / ".cache/jax_fastbox"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nsamp", type=int, default=256)
    p.add_argument("--box", type=float, default=4000.0)
    p.add_argument("--lattice-B", type=int, default=3)
    p.add_argument("--no-lattice", action="store_true",
                   help="probe the pure scatter engine instead")
    p.add_argument("--redshift", type=float, default=0.0)
    p.add_argument("--redshift-init", type=float, default=15.0)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--gradient", default="spectral",
                   choices=["spectral", "fd4", "fd6"],
                   help="PM force differentiation (fields/cola.py): fd4/fd6 "
                        "replace the 3 spectral-gradient inverse transforms "
                        "with one potential inverse + centred differences")
    p.add_argument("--fft-precision", default=None,
                   help="matmul-DFT einsum precision for the force solve "
                        "(DEFAULT/HIGH/HIGHEST; None = module default)")
    p.add_argument("--fuse", type=int, default=0,
                   help="fuse_force_gather: gather all 3 PM force "
                        "components in one Pallas kernel for ladder "
                        "branches with band <= FUSE (0 = per-mesh "
                        "gathers, the validated default)")
    p.add_argument("--repeat", type=int, default=0,
                   help="after the diagnostic run, re-run the evolution "
                        "this many times (fresh seeds, no diagnostics) "
                        "and report steady-state s/realisation with a "
                        "forced host materialisation (the tunnel's "
                        "block_until_ready returns early — CLAUDE.md)")
    args = p.parse_args()

    from fastbox_tpu.cosmology import build_cosmology
    from fastbox_tpu.fields.cola import realise_density_cola
    from fastbox_tpu.grid import GridSpec
    from fastbox_tpu.ops.spectra import binned_power_spectrum

    cosmo = build_cosmology(dict(Omega_c=0.25, Omega_b=0.05, h=0.7,
                                 n_s=0.95, sigma8=0.8),
                            redshift=args.redshift)
    grid = GridSpec.create(box_scale=(args.box,) * 3, nsamp=args.nsamp,
                           redshift=args.redshift)

    t0 = time.time()
    delta, _, diag = realise_density_cola(
        jax.random.PRNGKey(args.seed), grid, cosmo,
        redshift_init=args.redshift_init, keep_velocities=False,
        lattice_B=None if args.no_lattice else args.lattice_B,
        gradient=args.gradient, fft_precision=args.fft_precision,
        fuse_force_gather=args.fuse, diagnostics=True)
    delta.block_until_ready()
    print(f"# evolve ({args.nsamp}^3, {args.box:.0f} Mpc, "
          f"z {args.redshift_init} -> {args.redshift}) "
          f"in {time.time() - t0:.1f}s", flush=True)

    maxd = np.asarray(diag["maxdisp"])
    frac = np.asarray(diag["frac_out"])
    used = np.asarray(diag["used_lattice"])
    B = args.lattice_B
    for i in range(maxd.size):
        u = int(used[i])
        branch = ("disabled" if u < 0
                  else f"lattice B={u + 1}" if u < B else "scatter")
        print(f"step {i:2d}: max|d| = {maxd[i]:8.3f} cells   "
              f"frac>B = {frac[i]:.3e}   branch = {branch}")
    print(f"final max|d| = {float(diag['final_maxdisp']):.3f} cells")

    kc, pk, _ = binned_power_spectrum(grid, delta_x=delta)
    kc, pk = np.asarray(kc), np.asarray(pk)
    pk_lin = np.asarray(cosmo.pk_lin(kc))
    sel = np.isfinite(pk) & (kc > 3e-3) & (kc < 2e-2) & (pk_lin > 0)
    with np.printoptions(precision=3, suppress=True):
        print("k:", kc[sel])
        print("P/P_lin (large scales):", pk[sel] / pk_lin[sel])
    print(f"std(delta) = {float(np.std(np.asarray(delta))):.4f}")

    if args.repeat > 0:
        import jax.numpy as jnp

        def one(seed):
            d, _ = realise_density_cola(
                jax.random.PRNGKey(seed), grid, cosmo,
                redshift_init=args.redshift_init, keep_velocities=False,
                lattice_B=None if args.no_lattice else args.lattice_B,
                gradient=args.gradient, fft_precision=args.fft_precision,
                fuse_force_gather=args.fuse)
            return jnp.std(d)

        float(one(10_000))  # warm the no-diagnostics program
        t0 = time.time()
        for i in range(args.repeat):
            s = one(10_001 + i)
        _ = float(s)  # host materialisation forces completion
        dt = (time.time() - t0) / args.repeat
        print(f"# steady-state: {dt:.2f} s/realisation "
              f"({args.repeat} repeats)", flush=True)


if __name__ == "__main__":
    main()
