"""Roll-based lattice CIC (fields/lattice_cic.py) vs the scatter/gather path.

The lattice formulation must be *exactly* the same operator as the
scatter-based CIC whenever displacements respect the band bound — these
tests pin that down in f64, plus the COLA integration (equivalence of the
full evolution, and the runtime fallback when the bound is violated).
"""
import jax
import jax.numpy as jnp
import numpy as np

from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.fields.cola import (
    cic_gather,
    cic_paint_particles,
    realise_density_cola,
)
from fastbox_tpu.fields.lattice_cic import (
    cic_gather_lattice,
    cic_paint_lattice,
    wrapped_displacement,
)
from fastbox_tpu.grid import GridSpec


def _lattice_setup(rng, N, B):
    disp = rng.uniform(-B, B, size=(N, N, N, 3))
    idx = np.stack(np.meshgrid(*(np.arange(N),) * 3, indexing="ij"), axis=-1)
    u = (idx + disp) % N  # box-wrapped positions in cell units
    return disp, u


def test_wrapped_displacement_recovers_raw_offsets(rng):
    N, B = 16, 3
    disp, u = _lattice_setup(rng, N, B)
    d = np.asarray(wrapped_displacement(jnp.asarray(u), N))
    assert np.abs(d - disp).max() < 1e-12


def test_paint_matches_scatter(rng):
    N, B = 16, 2
    disp, u = _lattice_setup(rng, N, B)
    w = rng.uniform(0.5, 2.0, size=(N, N, N))

    ref = cic_paint_particles(jnp.asarray(u.reshape(-1, 3)), N,
                              weights=jnp.asarray(w.ravel()))
    d = wrapped_displacement(jnp.asarray(u), N)
    got = cic_paint_lattice(d, B=B, weights=jnp.asarray(w))
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-11

    # unweighted too (mass conservation: sums to N^3)
    got1 = cic_paint_lattice(d, B=B)
    ref1 = cic_paint_particles(jnp.asarray(u.reshape(-1, 3)), N)
    assert np.abs(np.asarray(ref1) - np.asarray(got1)).max() < 1e-11
    assert abs(float(got1.sum()) - N**3) < 1e-8


def test_gather_matches_scatter_gather(rng):
    N, B = 16, 2
    disp, u = _lattice_setup(rng, N, B)
    mesh = jnp.asarray(rng.standard_normal((N, N, N)))
    ref = cic_gather(mesh, jnp.asarray(u.reshape(-1, 3))).reshape(N, N, N)
    d = wrapped_displacement(jnp.asarray(u), N)
    got = cic_gather_lattice(mesh, d, B=B)
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-12


def test_paint_gather_are_adjoint(rng):
    """<paint(w), m> == <w, gather(m)> — the pair is used as scatter and its
    transpose in the PM force, so adjointness is load-bearing."""
    N, B = 8, 2
    disp, u = _lattice_setup(rng, N, B)
    d = wrapped_displacement(jnp.asarray(u), N)
    w = jnp.asarray(rng.standard_normal((N, N, N)))
    m = jnp.asarray(rng.standard_normal((N, N, N)))
    lhs = float(jnp.vdot(cic_paint_lattice(d, B=B, weights=w), m))
    rhs = float(jnp.vdot(w, cic_gather_lattice(m, d, B=B)))
    assert abs(lhs - rhs) < 1e-9 * max(1.0, abs(lhs))


def test_pallas_kernels_match_xla_rolls(rng):
    """The fused Pallas paint/gather (ops/pallas/lattice_cic.py) must equal
    the XLA-roll formulation (interpret mode; tiny case for CPU speed —
    chosen so both one- and two-piece ``_rows`` slices are exercised)."""
    from fastbox_tpu.ops.pallas.lattice_cic import (
        cic_gather_lattice_pallas,
        cic_paint_lattice_pallas,
    )

    N, B = 8, 1
    disp, u = _lattice_setup(rng, N, B)
    d = wrapped_displacement(jnp.asarray(u, jnp.float32), N)
    w = jnp.asarray(rng.uniform(0.5, 2.0, size=(N, N, N)).astype(np.float32))
    mesh = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))

    p_ref = cic_paint_lattice(d, B=B, weights=w)
    p_pl = cic_paint_lattice_pallas(d, B=B, weights=w, interpret=True)
    assert np.abs(np.asarray(p_ref) - np.asarray(p_pl)).max() < 1e-5

    g_ref = cic_gather_lattice(mesh, d, B=B)
    g_pl = cic_gather_lattice_pallas(mesh, d, B=B, interpret=True)
    assert np.abs(np.asarray(g_ref) - np.asarray(g_pl)).max() < 1e-5


def test_pallas_openband_matches_closed(rng):
    """Open-band kernels (2B+1 offsets per axis, valid for |d| < B
    STRICTLY — the cola ladder's guarantee) must equal the closed-band
    kernels and the XLA-roll oracle on strictly-bounded displacements."""
    from fastbox_tpu.ops.pallas.lattice_cic import (
        cic_gather3_lattice_pallas,
        cic_gather_lattice_pallas,
        cic_paint_lattice_pallas,
    )

    for N, B in ((8, 1), (16, 2), (16, 3)):
        # Strict interior draw: |d| <= 0.999 B < B.
        disp = rng.uniform(-0.999 * B, 0.999 * B, size=(N, N, N, 3))
        idx = np.stack(np.meshgrid(*(np.arange(N),) * 3, indexing="ij"),
                       axis=-1)
        u = (idx + disp) % N
        d = wrapped_displacement(jnp.asarray(u, jnp.float32), N)
        w = jnp.asarray(rng.uniform(0.5, 2.0,
                                    size=(N, N, N)).astype(np.float32))
        meshes = tuple(jnp.asarray(
            rng.standard_normal((N, N, N)).astype(np.float32))
            for _ in range(3))

        p_ref = cic_paint_lattice(d.astype(jnp.float64), B=B,
                                  weights=w.astype(jnp.float64))
        p_o = cic_paint_lattice_pallas(d, B=B, weights=w, interpret=True,
                                       openband=True)
        assert np.abs(np.asarray(p_ref) - np.asarray(p_o)).max() < 1e-4

        g_ref = cic_gather_lattice(meshes[0].astype(jnp.float64),
                                   d.astype(jnp.float64), B=B)
        g_o = cic_gather_lattice_pallas(meshes[0], d, B=B, interpret=True,
                                        openband=True)
        assert np.abs(np.asarray(g_ref) - np.asarray(g_o)).max() < 1e-5

        g3 = cic_gather3_lattice_pallas(meshes, d, B=B, interpret=True,
                                        openband=True)
        for m, got in zip(meshes, g3):
            ref = cic_gather_lattice(m.astype(jnp.float64),
                                     d.astype(jnp.float64), B=B)
            assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-5


def test_cola_lattice_matches_scatter_path():
    """Full COLA evolution: lattice CIC and scatter CIC give the same field
    (identical operators, different summation order only)."""
    cosmo = build_cosmology(dict(Omega_c=0.25, Omega_b=0.05, h=0.7,
                                 n_s=0.95, sigma8=0.8), redshift=0.0)
    grid = GridSpec.create(box_scale=(1e3,) * 3, nsamp=16, redshift=0.0)
    kw = dict(redshift_init=9.0, n_steps=4, dtype=jnp.float64)
    d_lat, v_lat = realise_density_cola(jax.random.PRNGKey(5), grid, cosmo,
                                        lattice_B=2, **kw)
    d_sc, v_sc = realise_density_cola(jax.random.PRNGKey(5), grid, cosmo,
                                      lattice_B=None, **kw)
    assert np.abs(np.asarray(d_lat) - np.asarray(d_sc)).max() < 1e-8
    assert np.abs(np.asarray(v_lat) - np.asarray(v_sc)).max() < 1e-6


def test_cola_bound_violation_falls_back():
    """lattice_B=0 cannot hold (displacements exceed 0 cells), so every step
    must take the exact scatter fallback — results identical to the
    all-scatter path."""
    cosmo = build_cosmology(dict(Omega_c=0.25, Omega_b=0.05, h=0.7,
                                 n_s=0.95, sigma8=0.8), redshift=0.0)
    grid = GridSpec.create(box_scale=(1e3,) * 3, nsamp=16, redshift=0.0)
    kw = dict(redshift_init=9.0, n_steps=3, dtype=jnp.float64)
    d0, _ = realise_density_cola(jax.random.PRNGKey(6), grid, cosmo,
                                 lattice_B=0, **kw)
    d1, _ = realise_density_cola(jax.random.PRNGKey(6), grid, cosmo,
                                 lattice_B=None, **kw)
    assert np.abs(np.asarray(d0) - np.asarray(d1)).max() < 1e-8

def test_pallas_kernel_variants_match(rng):
    """The swapped-roll-axis (inner='y') kernel bodies and the fused
    3-mesh gather must reproduce the default (inner='z') single-mesh
    kernels exactly — same arithmetic, different roll scheduling."""
    from fastbox_tpu.ops.pallas.lattice_cic import (
        cic_gather3_lattice_pallas,
        cic_gather_lattice_pallas,
        cic_paint_lattice_pallas,
    )

    for N, B in ((8, 1), (16, 2)):
        disp, u = _lattice_setup(rng, N, B)
        d = wrapped_displacement(jnp.asarray(u, jnp.float32), N)
        w = jnp.asarray(rng.uniform(0.5, 2.0,
                                    size=(N, N, N)).astype(np.float32))
        meshes = tuple(jnp.asarray(
            rng.standard_normal((N, N, N)).astype(np.float32))
            for _ in range(3))

        p_ref = cic_paint_lattice_pallas(d, B=B, weights=w, interpret=True)
        p_y = cic_paint_lattice_pallas(d, B=B, weights=w, interpret=True,
                                       inner="y")
        assert np.abs(np.asarray(p_ref) - np.asarray(p_y)).max() < 1e-5

        g_ref = [cic_gather_lattice_pallas(m, d, B=B, interpret=True)
                 for m in meshes]
        g_y = cic_gather_lattice_pallas(meshes[0], d, B=B, interpret=True,
                                        inner="y")
        assert np.abs(np.asarray(g_ref[0]) - np.asarray(g_y)).max() < 1e-5
        for inner in ("z", "y"):
            g3 = cic_gather3_lattice_pallas(meshes, d, B=B, interpret=True,
                                            inner=inner)
            for a, b in zip(g_ref, g3):
                assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-5


def test_lattice_kernels_z_onfly_matches(rng, monkeypatch):
    """The on-the-fly z-weight path (forced via a tiny block threshold)
    is exact vs the resident-plane default.

    At 512^3 blocks (4.19 MB) the (2B+1) resident z planes alone exceed
    the physical VMEM, so large blocks recompute each plane from the
    hoisted (floor, frac) pair (round 5; _Z_ONFLY_BLOCK_BYTES).  The
    arithmetic is identical — only liveness changes."""
    from fastbox_tpu.ops.pallas import lattice_cic as plc

    N, B = 16, 2
    d = jnp.asarray(rng.uniform(-(B - 0.01), B - 0.01,
                                size=(N, N, N, 3)).astype(np.float32))
    mesh = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
    meshes = (mesh, mesh * 0.5, mesh - 1.0)

    p_ref = plc.cic_paint_lattice_pallas(d, B=B, openband=True,
                                         interpret=True)
    g_ref = plc.cic_gather_lattice_pallas(mesh, d, B=B, openband=True,
                                          interpret=True)
    g3_ref = plc.cic_gather3_lattice_pallas(meshes, d, B=B, openband=True,
                                            interpret=True)

    monkeypatch.setattr(plc, "_Z_ONFLY_BLOCK_BYTES", 1)
    jax.clear_caches()  # the threshold is read at trace time
    p_of = plc.cic_paint_lattice_pallas(d, B=B, openband=True,
                                        interpret=True)
    g_of = plc.cic_gather_lattice_pallas(mesh, d, B=B, openband=True,
                                         interpret=True)
    g3_of = plc.cic_gather3_lattice_pallas(meshes, d, B=B, openband=True,
                                           interpret=True)
    jax.clear_caches()

    assert np.abs(np.asarray(p_ref) - np.asarray(p_of)).max() == 0.0
    assert np.abs(np.asarray(g_ref) - np.asarray(g_of)).max() == 0.0
    for a, b in zip(g3_ref, g3_of):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() == 0.0
