"""f32-accumulation accuracy of the Pallas binned-P(k) kernel at scale.

The blocker for wiring ops/pallas/binned_pk.py into the default estimator
(VERDICT round 1): does its f32 accumulation at 256^3 (sequential slab
accumulation into VMEM) hold the 1e-4 bar against a float64 host oracle on
realistically-distributed power values?  Also measures the XLA
one-hot-matmul reduction path (ops/reduce.py) on the same data for a fair
comparison.

Run on TPU from the repo root:
    python scripts/check_binned_pk_accuracy.py --nsamp 256
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_fastbox"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsamp", type=int, default=256)
    ap.add_argument("--box", type=float, default=4e3)
    args = ap.parse_args()

    from fastbox_tpu.cosmology import build_cosmology
    from fastbox_tpu.fields import gaussian
    from fastbox_tpu.grid import GridSpec
    from fastbox_tpu.ops.pallas.binned_pk import binned_pk_pallas
    from fastbox_tpu.ops.reduce import binned_weighted_sum_sumsq_count
    from fastbox_tpu.ops.spectra import default_kbins

    N = args.nsamp
    grid = GridSpec.create(box_scale=(args.box,) * 3, nsamp=N, redshift=0.8)
    cosmo = build_cosmology(dict(Omega_c=0.25, Omega_b=0.05, h=0.7,
                                 n_s=0.95, sigma8=0.8), redshift=0.8)

    # Realistic power cube: |delta_k|^2 of an actual realisation
    @jax.jit
    def make_p3(key):
        white = gaussian.white_noise(key, grid, jnp.float32)
        _, dk = gaussian.gaussian_field_from_whitenoise(white, grid,
                                                        cosmo.pk_nl)
        return (dk * jnp.conj(dk)).real / jnp.float32(grid.boxfactor)

    p3 = make_p3(jax.random.PRNGKey(0))
    p3_h = np.asarray(p3, np.float64)

    kx, ky, kz = (np.asarray(v, np.float64) for v in grid.kvec(jnp.float64))
    edges = np.asarray(default_kbins(grid, 20), np.float64)
    # Squared-space classification (the round-4 kernel contract)
    k2 = (kx[:, None, None] ** 2 + ky[None, :, None] ** 2
          + kz[None, None, :] ** 2)
    idx = np.digitize(k2.ravel(), edges**2)

    # f64 host oracle
    nb = edges.size + 1
    sums_o = np.bincount(idx, weights=p3_h.ravel(), minlength=nb)
    sumsq_o = np.bincount(idx, weights=(p3_h**2).ravel(), minlength=nb)
    cnt_o = np.bincount(idx, minlength=nb)

    # Pallas kernel (f32 accumulation)
    s, q, c = binned_pk_pallas(p3, jnp.asarray(kx**2, jnp.float32),
                               jnp.asarray(ky**2, jnp.float32),
                               jnp.asarray(kz**2, jnp.float32),
                               jnp.asarray(edges**2, jnp.float32))
    s = np.asarray(s, np.float64)
    q = np.asarray(q, np.float64)
    c = np.asarray(c, np.float64)

    # XLA reduction path on the same data (what the estimator uses today)
    idx_j = jnp.asarray(idx.astype(np.int32))
    w = jnp.ones(p3.size, jnp.float32)
    s2, q2, c2 = (np.asarray(v, np.float64)
                  for v in jax.jit(binned_weighted_sum_sumsq_count,
                                   static_argnums=(3,))(
                      p3.ravel(), w, idx_j, int(edges.size)))

    def report(name, sums, sumsqs, cnts, nbins):
        # skip empty bins AND the k=0 bin (count 1, exactly zero power)
        sel = (cnt_o[:nbins] > 0) & (sums_o[:nbins] > 0)
        rs = np.abs(sums[sel] - sums_o[:nbins][sel]) / sums_o[:nbins][sel]
        rq = np.abs(sumsqs[sel] - sumsq_o[:nbins][sel]) / sumsq_o[:nbins][sel]
        dc = np.abs(cnts[sel] - cnt_o[:nbins][sel]).max()
        print(f"{name:28s} max rel sum err {rs.max():.3e}  "
              f"max rel sumsq err {rq.max():.3e}  count err {dc:.0f}")

    # binned_pk_pallas digitizes with nbins = edges.size bins (0..nbins-1
    # where bin b < edges[b]); our oracle idx matches np.digitize
    report("pallas f32", s, q, c, edges.size)
    report("xla one-hot f32", s2, q2, c2, edges.size)


if __name__ == "__main__":
    main()
