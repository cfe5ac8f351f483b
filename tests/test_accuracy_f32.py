"""The BASELINE.json accuracy criterion: the float32 TPU pipeline's spectra
must match the float64 CPU reference at <= 1e-4 relative tolerance on
matched white-noise inputs."""
import jax
import jax.numpy as jnp
import numpy as np

import oracle
from fastbox_tpu.fields import gaussian
from fastbox_tpu.grid import GridSpec
from fastbox_tpu.ops import spectra
from fastbox_tpu.ops.rsd import redshift_space_density

N = 32
GRID = GridSpec.create(box_scale=(1e3, 1e3, 1e3), nsamp=N, redshift=0.0)


def test_f32_spectrum_within_1e4(cosmo_z0, rng):
    white64 = (rng.standard_normal(GRID.shape)
               + 1j * rng.standard_normal(GRID.shape))

    # f64 oracle (numpy)
    _, _, _, k = oracle.kgrids(N, GRID.Lx, GRID.Ly, GRID.Lz)
    pk_grid = np.asarray(cosmo_z0.pk_nl(k))
    _, dk_o = oracle.gaussian_field(white64, pk_grid, GRID.boxfactor)
    kc_o, pk_o, _ = oracle.binned_power_spectrum(dk_o, k, GRID.kmin,
                                                 GRID.kmax, GRID.boxfactor)

    # f32 device path on the same noise
    white32 = jnp.asarray(white64.astype(np.complex64))
    dx32, dk32 = gaussian.gaussian_field_from_whitenoise(white32, GRID,
                                                         cosmo_z0.pk_nl)
    assert dx32.dtype == jnp.float32
    kc_j, pk_j, _ = spectra.binned_power_spectrum(GRID, delta_k=dk32)

    pk_j = np.asarray(pk_j, dtype=np.float64)
    good = np.isfinite(pk_o) & (pk_o > 0)
    rel = np.abs(pk_j[good] - pk_o[good]) / pk_o[good]
    assert rel.max() < 1e-4, rel.max()


def test_f32_rsd_within_1e4(cosmo_z0, rng):
    white64 = (rng.standard_normal(GRID.shape)
               + 1j * rng.standard_normal(GRID.shape))
    _, _, _, k = oracle.kgrids(N, GRID.Lx, GRID.Ly, GRID.Lz)
    pk_grid = np.asarray(cosmo_z0.pk_nl(k))
    dx_o, dk_o = oracle.gaussian_field(white64, pk_grid, GRID.boxfactor)
    fac = (100.0 * cosmo_z0.h * cosmo_z0.Ea * cosmo_z0.growth_rate
           * cosmo_z0.scale_factor)
    _, _, vz_ok = oracle.velocity_field(dk_o, N, GRID.Lx, GRID.Ly, GRID.Lz, fac)
    vz_o = np.fft.ifftn(vz_ok).real
    Hz = 100.0 * cosmo_z0.h * cosmo_z0.Ea
    ds_o = oracle.redshift_space_density(dx_o, vz_o, np.asarray(GRID.z), Hz)

    # f32 device path
    white32 = jnp.asarray(white64.astype(np.complex64))
    dx32, dk32 = gaussian.gaussian_field_from_whitenoise(white32, GRID,
                                                         cosmo_z0.pk_nl)
    v32 = gaussian.realise_velocity(dk32, GRID, cosmo_z0)
    vz32 = jnp.fft.ifftn(v32[2]).real.astype(jnp.float32)
    ds32 = redshift_space_density(dx32, vz32, GRID, Hz)

    # Compare the redshift-space *spectra* (pointwise field values can
    # differ near cell boundaries at f32; the statistical contract is on
    # spectra, BASELINE.md)
    _, pk_o, _ = oracle.binned_power_spectrum(
        np.fft.fftn(ds_o), k, GRID.kmin, GRID.kmax, GRID.boxfactor)
    _, pk_j, _ = spectra.binned_power_spectrum(GRID, delta_x=ds32)
    pk_j = np.asarray(pk_j, dtype=np.float64)
    good = np.isfinite(pk_o) & (pk_o > 1e-10)
    rel = np.abs(pk_j[good] - pk_o[good]) / pk_o[good]
    assert rel.max() < 1e-4, rel.max()
