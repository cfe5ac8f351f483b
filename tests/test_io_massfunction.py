"""Checkpoint IO + Sheth-Tormen mass function."""
import numpy as np
import jax.numpy as jnp

from fastbox_tpu import io as fio
from fastbox_tpu.box import CosmoBox, default_cosmo
from fastbox_tpu.cosmology import massfunction as mf
from fastbox_tpu.models.halos import HaloDistribution


def test_save_load_box(tmp_path):
    box = CosmoBox(cosmo=default_cosmo, box_scale=(1e2,) * 3, nsamp=16,
                   redshift=0.5, realise_now=True, seed=4)
    path = str(tmp_path / "box.npz")
    fio.save_box(path, box)
    box2 = fio.load_box(path)
    assert box2.N == 16 and box2.redshift == 0.5
    assert np.allclose(np.asarray(box2.delta_x), np.asarray(box.delta_x))
    assert np.allclose(np.asarray(box2.delta_k), np.asarray(box.delta_k))
    assert np.allclose(np.asarray(box2.velocity_k[2]),
                       np.asarray(box.velocity_k[2]))
    # Restored box is fully functional
    k, pk, _ = box2.binned_power_spectrum()
    assert np.any(np.isfinite(np.asarray(pk)))


def test_save_load_fields(tmp_path):
    path = str(tmp_path / "f.npz")
    fio.save_fields(path, a=jnp.arange(10.0), b=jnp.ones((3, 3)) * 1j)
    out = fio.load_fields(path)
    assert np.allclose(np.asarray(out["a"]), np.arange(10.0))
    assert out["b"].dtype.kind == "c"


def test_mass_function_physics(cosmo_z0):
    M = np.logspace(12, 15, 12)
    sig = mf.sigma_m(cosmo_z0, M)
    assert np.all(np.diff(sig) < 0)  # sigma decreases with mass
    # sigma(M) at the 8 Mpc/h Lagrangian mass ~ sigma8
    rho_m = mf.RHO_CRIT0 * cosmo_z0.params.h**2 * cosmo_z0.params.Omega_m
    M8 = 4.0 / 3.0 * np.pi * (8.0 / cosmo_z0.params.h) ** 3 * rho_m
    s8 = mf.sigma_m(cosmo_z0, M8)
    assert np.isclose(float(s8[0]), 0.8, rtol=0.02)

    dn = mf.dndlog10m(cosmo_z0, M)
    assert np.all(dn > 0) and np.all(np.diff(np.log(dn)) < 0)
    # Reasonable abundance: ~1e-3 -- 1e-4 per Mpc^3 per dex at 1e13 Msun
    dn13 = mf.dndlog10m(cosmo_z0, np.array([1e13]))[0]
    assert 1e-5 < dn13 < 1e-2

    b = mf.halo_bias(cosmo_z0, M)
    assert np.all(np.diff(b) > 0)     # bias grows with mass
    assert 0.5 < b[0] < 2.0           # ~unbiased at group scales
    assert b[-1] > 2.0                # clusters strongly biased


def test_construct_bins():
    box = CosmoBox(cosmo=default_cosmo, box_scale=(1e2,) * 3, nsamp=16,
                   realise_now=False)
    h = HaloDistribution(box, mass_range=(1e12, 1e15), mass_bins=10)
    centres, dn, b = h.construct_bins(z=0.5)
    assert centres.shape == dn.shape == b.shape == (10,)
    assert np.all(dn > 0) and np.all(b > 0)
    assert h.dndlog10M is dn and h.bias is b
