"""nbodykit-style wrapper layer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastbox_tpu.cosmology import build_cosmology
from fastbox_tpu.fields import gaussian
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.ops import ArrayCatalog, ArrayMesh, FFTCorr, FFTPower, spectra

GRID = GridSpec.create(box_scale=(1e3,) * 3, nsamp=16)


def _field(cosmo):
    dx, _ = gaussian.realise_density(jax.random.PRNGKey(0), GRID, cosmo,
                                     dtype=jnp.float64)
    return dx


def test_fftpower_matches_native(cosmo_z0):
    dx = _field(cosmo_z0)
    mesh = ArrayMesh(dx, BoxSize=1e3)
    r = FFTPower(mesh, mode="1d")
    native = spectra.power_spectrum(GRID, dx)
    assert np.allclose(r.power["power"], np.asarray(native["power"]),
                       equal_nan=True)
    # 2d + poles
    r2 = FFTPower(mesh, mode="2d", Nmu=4, poles=(0, 2))
    assert r2.power["power"].shape[1] == 4
    assert "power_2" in r2.poles


def test_fftcorr_and_cross(cosmo_z0):
    dx = _field(cosmo_z0)
    mesh = ArrayMesh(dx, BoxSize=1e3)
    c = FFTCorr(mesh, dr=10.0)
    assert np.isfinite(c.corr["corr"]).sum() > 5
    x = FFTPower(mesh, second=mesh)
    auto = FFTPower(mesh)
    assert np.allclose(x.power["power"], auto.power["power"], equal_nan=True)


def test_catalog_to_mesh(rng):
    pos = rng.random((2000, 3)) * 1e3
    cat = ArrayCatalog({"Position": pos})
    mesh = cat.to_mesh(Nmesh=16, BoxSize=1e3, window="tsc", compensated=True)
    assert mesh.field.shape == (16, 16, 16)
    assert abs(float(jnp.mean(mesh.field))) < 1e-6
    r = FFTPower(mesh)
    assert np.isfinite(r.power["power"]).sum() > 3


def test_arbitrary_los(cosmo_z0):
    """los is any 3-vector; x-LOS on the transposed field == z-LOS."""
    import numpy as np

    field = _field(cosmo_z0)
    mesh_z = ArrayMesh(field, BoxSize=1e3)
    mesh_x = ArrayMesh(field.transpose(2, 1, 0), BoxSize=1e3)
    pz = FFTPower(mesh_z, poles=(0, 2), los=(0, 0, 1)).poles
    px = FFTPower(mesh_x, poles=(0, 2), los=(2, 0, 0)).poles  # unnormalized ok
    for name in ("power_0", "power_2"):
        a, b = pz[name], px[name]
        sel = np.isfinite(a) & np.isfinite(b)
        assert np.allclose(a[sel], b[sel], rtol=1e-10)
