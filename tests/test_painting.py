"""Catalogue painting: mass conservation, known positions, compensation."""
import jax.numpy as jnp
import numpy as np

from fastbox_tpu.grid import GridSpec
from fastbox_tpu.ops import painting
from fastbox_tpu.ops.spectra import power_spectrum

GRID = GridSpec.create(box_scale=(1e2, 1e2, 1e2), nsamp=16)


def test_mass_conservation(rng):
    pos = rng.random((200, 3)) * 100.0
    for window in ("ngp", "cic", "tsc"):
        mesh = np.asarray(painting.paint_catalogue(jnp.asarray(pos), GRID,
                                                   window=window))
        assert np.isclose(mesh.sum(), 200.0, rtol=1e-6), window
        assert mesh.min() >= 0.0


def test_ngp_exact_cell():
    # A particle at the centre of cell (3,4,5) lands exactly there
    dx = 100.0 / 16
    pos = jnp.asarray([[3 * dx, 4 * dx, 5 * dx]])
    mesh = np.asarray(painting.paint_catalogue(pos, GRID, window="ngp"))
    assert mesh[3, 4, 5] == 1.0
    assert mesh.sum() == 1.0


def test_cic_on_grid_point():
    # A particle exactly on a grid point gets full weight in that cell
    dx = 100.0 / 16
    pos = jnp.asarray([[2 * dx, 2 * dx, 2 * dx]])
    mesh = np.asarray(painting.paint_catalogue(pos, GRID, window="cic"))
    assert np.isclose(mesh[2, 2, 2], 1.0)


def test_cic_half_cell_split():
    # A particle halfway between two grid points splits 50/50 along x
    dx = 100.0 / 16
    pos = jnp.asarray([[2.5 * dx, 2 * dx, 2 * dx]])
    mesh = np.asarray(painting.paint_catalogue(pos, GRID, window="cic"))
    assert np.isclose(mesh[2, 2, 2], 0.5)
    assert np.isclose(mesh[3, 2, 2], 0.5)


def test_tsc_spreads_over_27():
    dx = 100.0 / 16
    pos = jnp.asarray([[2.2 * dx, 7.7 * dx, 11.4 * dx]])
    mesh = np.asarray(painting.paint_catalogue(pos, GRID, window="tsc"))
    assert np.isclose(mesh.sum(), 1.0)
    assert (mesh > 0).sum() <= 27


def test_periodic_wrap(rng):
    # Particle at the far edge wraps to cell 0
    pos = jnp.asarray([[99.9, 0.1, 0.1]])
    mesh = np.asarray(painting.paint_catalogue(pos, GRID, window="cic"))
    assert np.isclose(mesh.sum(), 1.0)
    # weight present in both cell 15 and wrapped cell 0 along x
    assert mesh[15, 0, 0] > 0 and mesh[0, 0, 0] > 0


def test_weights(rng):
    pos = rng.random((50, 3)) * 100.0
    w = rng.random(50)
    mesh = np.asarray(painting.paint_catalogue(jnp.asarray(pos), GRID,
                                               weights=jnp.asarray(w),
                                               window="cic"))
    assert np.isclose(mesh.sum(), w.sum(), rtol=1e-6)


def test_compensation_flattens_shotnoise_spectrum(rng):
    """Poisson catalogue: the compensated P(k) stays near the shot-noise
    plateau V/Np at high k, while the uncompensated one is suppressed."""
    grid = GridSpec.create(box_scale=(1e2,) * 3, nsamp=32)
    n_p = 40000
    pos = jnp.asarray(rng.random((n_p, 3)) * 100.0)

    d_comp = painting.overdensity_from_catalogue(pos, grid, window="tsc",
                                                 compensated=True)
    d_raw = painting.overdensity_from_catalogue(pos, grid, window="tsc",
                                                compensated=False)
    shot = 100.0**3 / n_p

    res_c = power_spectrum(grid, d_comp)
    res_r = power_spectrum(grid, d_raw)
    k = np.asarray(res_c["k"])
    pc = np.asarray(res_c["power"])
    pr = np.asarray(res_r["power"])
    # Bins between ~0.5 and ~0.95 of Nyquist (pi*N/L ~ 1.0): compensated is
    # flat at the shot plateau, uncompensated is strongly suppressed.
    # (Beyond Nyquist, aliasing dominates for any non-interlaced painter.)
    sel = (k > 0.5) & (k < 0.95) & np.isfinite(pc)
    assert sel.sum() >= 3
    assert np.all(np.abs(pc[sel] / shot - 1.0) < 0.15)
    assert np.all(pr[sel] / shot < 0.75)


def test_interlacing_suppresses_aliasing(rng):
    """Compensated P(k) of an unclustered (uniform) catalogue should be flat
    shot noise; interlacing must reduce the high-k aliasing bias."""
    npart = 40000
    pos = jnp.asarray(rng.uniform(0.0, 1e2, size=(npart, 3)))
    pshot = GRID.volume / npart

    def highk_bias(interlaced):
        delta = painting.overdensity_from_catalogue(
            pos, GRID, window="cic", compensated=True, interlaced=interlaced)
        res = power_spectrum(GRID, delta)
        p = np.asarray(res["power"])
        p = p[np.isfinite(p)]
        # last finite bin sits at the Nyquist scale where aliasing peaks
        return abs(p[-1] / pshot - 1.0)

    plain = highk_bias(False)
    inter = highk_bias(True)
    assert inter < 0.5 * plain
    assert inter < 0.15


def test_interlaced_mesh_mean_zero(rng):
    pos = jnp.asarray(rng.uniform(0.0, 1e2, size=(5000, 3)))
    delta = painting.overdensity_from_catalogue(
        pos, GRID, window="tsc", compensated=True, interlaced=True)
    assert abs(float(jnp.mean(delta))) < 1e-8
    assert np.all(np.isfinite(np.asarray(delta)))
