"""Pallas RSD interpolation kernel (interpreter mode) vs the XLA path."""
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fastbox_tpu.ops.pallas.rsd_interp import interp_sorted_pallas
from fastbox_tpu.ops.rsd import remap_los_batched


def test_interp_sorted_pallas_matches_xla(rng):
    M, C = 256, 32
    s = jnp.asarray(rng.random((M, C)) * 100.0, dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((M, C)), dtype=jnp.float32)
    z = jnp.linspace(0.0, 100.0, C, dtype=jnp.float32)
    fill = jnp.asarray(rng.standard_normal(M), dtype=jnp.float32)

    ss, vv = lax.sort_key_val(s, v)
    got = np.asarray(interp_sorted_pallas(ss, vv, z, fill, interpret=True))
    want = np.asarray(remap_los_batched(v, s, z, fill, "linear"))
    assert np.allclose(got, want, atol=1e-5)


def test_interp_sorted_pallas_hull_fill(rng):
    # Targets outside [min(s), max(s)] must return the fill value
    M, C = 128, 16
    s = jnp.asarray(40.0 + rng.random((M, C)) * 20.0, dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((M, C)), dtype=jnp.float32)
    z = jnp.linspace(0.0, 100.0, 32, dtype=jnp.float32)
    fill = jnp.full((M,), 7.5, dtype=jnp.float32)

    ss, vv = lax.sort_key_val(s, v)
    out = np.asarray(interp_sorted_pallas(ss, vv, z, fill, interpret=True))
    zn = np.asarray(z)
    outside = (zn[None, :] < np.asarray(ss[:, :1])) | \
              (zn[None, :] > np.asarray(ss[:, -1:]))
    assert np.all(out[outside] == 7.5)
    assert np.any(~outside)


def test_banded_interp_pallas_matches_jnp(rng):
    """Interpret-mode kernel vs the jnp banded reference, incl. hull fill."""
    from jax import lax
    from fastbox_tpu.ops.pallas.banded_interp import banded_interp_pallas
    from fastbox_tpu.ops.rsd import _interp_sorted_banded

    M, C, w = 256, 128, 4
    zt = np.linspace(0.0, 127.0, C)
    dz = zt[1] - zt[0]
    s = zt[None, :] + rng.uniform(-w * dz * 0.9, w * dz * 0.9, size=(M, C))
    v = rng.standard_normal((M, C))
    fill = rng.standard_normal(M)
    ss, vv = lax.sort_key_val(jnp.asarray(s), jnp.asarray(v))

    got = np.asarray(banded_interp_pallas(ss, vv, jnp.asarray(zt),
                                          jnp.asarray(fill), band=w,
                                          interpret=True))
    ref = np.asarray(_interp_sorted_banded(ss, vv, jnp.asarray(zt), w))
    inside = ((zt[None, :] >= np.asarray(ss)[:, :1])
              & (zt[None, :] <= np.asarray(ss)[:, -1:]))
    ref = np.where(inside, ref, fill[:, None])
    assert np.allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_banded_interp_pallas_duplicate_nodes():
    from jax import lax
    from fastbox_tpu.ops.pallas.banded_interp import banded_interp_pallas
    from fastbox_tpu.ops.rsd import remap_los_batched

    M, C = 8, 128
    zt = np.arange(C, dtype=np.float64)
    s = np.tile(zt, (M, 1))
    s[:, 10] = s[:, 11]  # duplicate node -> step transition
    v = np.random.default_rng(0).standard_normal((M, C))
    fill = np.zeros(M)
    ss, vv = lax.sort_key_val(jnp.asarray(s), jnp.asarray(v))
    got = np.asarray(banded_interp_pallas(ss, vv, jnp.asarray(zt),
                                          jnp.asarray(fill), band=4,
                                          interpret=True))
    want = np.asarray(remap_los_batched(jnp.asarray(v), jnp.asarray(s),
                                        jnp.asarray(zt), jnp.asarray(fill),
                                        band=0))
    assert np.allclose(got, want, rtol=1e-12, atol=1e-12)


def test_rsd_fused_bracket_matches_reference(rng):
    """Sort-free bracket kernel (interpret mode) vs wrap + sort + exact
    telescoping interp, with displacements crossing both box faces so the
    periodic roll-around path is exercised."""
    from fastbox_tpu.ops.pallas.rsd_fused import rsd_bracket_interp_pallas
    from fastbox_tpu.ops.rsd import remap_los_batched

    M, C, w = 256, 128, 4
    zt = np.linspace(0.0, 127.0, C)
    dz = zt[1] - zt[0]
    L = zt[-1] - zt[0]
    u = zt[None, :] + rng.uniform(-w * dz, w * dz, size=(M, C))
    v = rng.standard_normal((M, C))
    fill = rng.standard_normal(M)
    assert (u < zt[0]).any() and (u > zt[-1]).any()  # wrap is exercised

    s_wrapped = (u - zt[0]) % L + zt[0]
    out = rsd_bracket_interp_pallas(jnp.asarray(s_wrapped), jnp.asarray(v),
                                    jnp.asarray(zt), jnp.asarray(fill),
                                    band=w, interpret=True)
    want = np.asarray(remap_los_batched(jnp.asarray(v),
                                        jnp.asarray(s_wrapped),
                                        jnp.asarray(zt), jnp.asarray(fill),
                                        band=0, fused=False))
    assert np.allclose(np.asarray(out), want, rtol=1e-10, atol=1e-10)


def test_rsd_fused_hull_fill(rng):
    """Targets outside [min s, max s] must take the fill value."""
    from fastbox_tpu.ops.pallas.rsd_fused import rsd_bracket_interp_pallas

    M, C = 256, 128
    zt = np.linspace(0.0, 127.0, C)
    # nodes confined to the middle of the box: edges outside the hull
    s = np.sort(40.0 + 40.0 * rng.random((M, C)), axis=1)
    v = rng.standard_normal((M, C))
    fill = np.full(M, 7.5)
    out = np.asarray(rsd_bracket_interp_pallas(
        jnp.asarray(s), jnp.asarray(v), jnp.asarray(zt), jnp.asarray(fill),
        band=4, interpret=True))
    outside = (zt[None, :] < s[:, :1]) | (zt[None, :] > s[:, -1:])
    # the bracket window cannot reach across the whole hull gap, but the
    # fill mask must win everywhere outside
    assert np.all(out[outside] == 7.5)
    assert np.any(~outside)


def test_redshift_space_density_fused_path_interpret(rng, monkeypatch):
    """End-to-end redshift_space_density through the fused kernel + cond
    wiring (interpret mode on CPU), vs the split jnp path.

    ``redshift_space_density`` is a module-level jit and ``_INTERPRET`` is
    read at trace time, so the split-path references are computed FIRST,
    then ``jax.clear_caches()`` forces a fresh trace under the monkeypatched
    flag — and a spy on the fused kernel proves it was actually wired in
    (an earlier version of this test was a silent jit-cache hit).
    """
    import fastbox_tpu.ops.pallas.rsd_fused as fused_mod
    import fastbox_tpu.ops.rsd as rsd_mod
    from fastbox_tpu.grid import GridSpec

    N = 64
    grid = GridSpec.create(box_scale=(500.0,) * 3, nsamp=N, redshift=0.0)
    delta = jnp.asarray(rng.standard_normal((N, N, N)))
    Hz = 70.0
    dz = float(np.asarray(grid.z)[1] - np.asarray(grid.z)[0])
    vel = jnp.asarray(0.3 * Hz * dz * rng.standard_normal((N, N, N)))
    # displacements ~3 cells: past the band-2 tier, inside band 4
    vel_mid = jnp.asarray(np.clip(
        0.9 * Hz * dz * rng.standard_normal((N, N, N)), -3.9 * Hz * dz,
        3.9 * Hz * dz))
    # shell-crossing velocities: the in-band check fails -> exact fallback
    vel_big = jnp.asarray(8.0 * Hz * dz * rng.standard_normal((N, N, N)))

    # Split-path references, traced with _INTERPRET=False
    want = np.asarray(rsd_mod.redshift_space_density(delta, vel, grid, Hz))
    want_mid = np.asarray(rsd_mod.redshift_space_density(delta, vel_mid,
                                                         grid, Hz))
    want_big = np.asarray(rsd_mod.redshift_space_density(delta, vel_big,
                                                         grid, Hz))

    calls = []
    real_kernel = fused_mod.rsd_remap_wrap_pallas

    def spy(*args, **kwargs):
        calls.append((kwargs.get("band"), kwargs.get("interpret")))
        return real_kernel(*args, **kwargs)

    monkeypatch.setattr(fused_mod, "rsd_remap_wrap_pallas", spy)
    monkeypatch.setattr(rsd_mod, "_INTERPRET", True)
    jax.clear_caches()  # drop the _INTERPRET=False trace of the same shapes

    got = np.asarray(rsd_mod.redshift_space_density(delta, vel, grid, Hz))
    assert calls and all(i for _, i in calls), \
        "wrap-fused bracket kernel was never traced in interpret mode"
    assert {b for b, _ in calls} == {2, 4}, \
        "both band tiers must be traced under the cond ladder"
    assert np.allclose(got, want, rtol=1e-9, atol=1e-9)

    got_mid = np.asarray(rsd_mod.redshift_space_density(delta, vel_mid,
                                                        grid, Hz))
    assert np.allclose(got_mid, want_mid, rtol=1e-9, atol=1e-9)

    got_big = np.asarray(rsd_mod.redshift_space_density(delta, vel_big,
                                                        grid, Hz))
    assert np.allclose(got_big, want_big, rtol=1e-9, atol=1e-9)


def test_rsd_fused_duplicate_nodes_match_exact(rng):
    """Duplicate node coordinates (different values) must tie-break like
    the stable-sort + telescoping exact path."""
    from fastbox_tpu.ops.pallas.rsd_fused import rsd_bracket_interp_pallas
    from fastbox_tpu.ops.rsd import remap_los_batched

    M, C = 256, 128
    zt = np.arange(C, dtype=np.float64)
    s = np.tile(zt, (M, 1)) + rng.uniform(-0.4, 0.4, size=(M, C))
    # inject exact duplicates at assorted places
    s[:, 40] = s[:, 41]
    s[:, 90] = s[:, 92]
    s[:, 7] = s[:, 5]
    v = rng.standard_normal((M, C))
    fill = rng.standard_normal(M)
    got = np.asarray(rsd_bracket_interp_pallas(
        jnp.asarray(s), jnp.asarray(v), jnp.asarray(zt), jnp.asarray(fill),
        band=4, interpret=True))
    want = np.asarray(remap_los_batched(jnp.asarray(v), jnp.asarray(s),
                                        jnp.asarray(zt), jnp.asarray(fill),
                                        band=0, fused=False))
    assert np.allclose(got, want, rtol=1e-10, atol=1e-10)
