"""Instrument & sky models: noise, tracers, foregrounds, halos, beams."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage
import scipy.signal

from fastbox_tpu.box import CosmoBox, default_cosmo
from fastbox_tpu.models import beams as beams_mod
from fastbox_tpu.models import halos as halos_mod
from fastbox_tpu.models.foregrounds import (
    ForegroundModel,
    PointSourceModel,
    gaussian_smooth_wrap,
)
from fastbox_tpu.models.noise import NoiseModel, radiometer_sigma
from fastbox_tpu.models.tracers import HITracer, TracerModel


def _box(n=16, z=0.8, seed=3):
    return CosmoBox(cosmo=default_cosmo, box_scale=(1e3,) * 3, nsamp=n,
                    redshift=z, realise_now=False, seed=seed)


# ----------------------------------------------------------------------
# Noise
# ----------------------------------------------------------------------
def test_radiometer_sigma_formula():
    box = _box()
    freqs = box.freq_array()
    ang_x, _ = box.pixel_array()
    sigma = radiometer_sigma(freqs, ang_x, Tinst=18.0, tp=2.0, fov=1.0,
                             Ndish=64)
    # Hand-evaluate the reference formula for channel 0 (noise.py:53-70)
    dnu = abs(freqs[1] - freqs[0])
    dtheta = ang_x[1] - ang_x[0]
    t_res = 2.0 * 3600.0 * dtheta**2 / 1.0
    Tsys = 18e3 + 60e3 * (freqs[0] / 300.0) ** (-2.5)
    want = Tsys / np.sqrt(64 * t_res * dnu * 1e6)
    assert np.isclose(sigma[0], want)


def test_noise_model_shape_and_scaling():
    box = _box()
    noise = np.asarray(NoiseModel(box).realise_radiometer_noise(18., 2., 1., 64))
    assert noise.shape == (16, 16, 16)
    # Per-channel std should track sigma(nu) (loose: 16^2 samples/channel)
    freqs = box.freq_array()
    ang_x, _ = box.pixel_array()
    sigma = radiometer_sigma(freqs, ang_x, 18.0, 2.0, 1.0, 64)
    ratio = noise.std(axis=(0, 1)) / sigma
    assert np.all(ratio > 0.6) and np.all(ratio < 1.5)


# ----------------------------------------------------------------------
# Tracers
# ----------------------------------------------------------------------
def test_tracer_models():
    box = _box(z=0.8)
    t = TracerModel(box)
    assert t.signal_amplitude(2.5, 0.8) == 2.5
    assert np.isclose(t.linear_bias(1.0, 0.8), np.sqrt(1.8))

    hi = HITracer(box)
    # Bull et al. (2015) fits at z=0.8 (reference tracers.py:115-163)
    assert np.isclose(hi.signal_amplitude(),
                      5.5919e-2 + 2.3242e-1 * 0.8 - 2.4136e-2 * 0.64)
    assert np.isclose(hi.bias_HI(),
                      6.6655e-1 + 1.7765e-1 * 0.8 + 5.0223e-2 * 0.64)
    assert np.isclose(hi.Omega_HI(),
                      4.8304e-4 + 3.8856e-4 * 0.8 - 6.5119e-5 * 0.64)
    # 'hall' formula returns something positive and O(0.1) mK
    assert 0.01 < hi.signal_amplitude(formula="hall") < 10.0


# ----------------------------------------------------------------------
# Foregrounds
# ----------------------------------------------------------------------
def test_gaussian_smooth_wrap_matches_scipy(rng):
    img = rng.standard_normal((24, 24))
    for sigma in (1.3, 3.0):
        got = np.asarray(gaussian_smooth_wrap(jnp.asarray(img), sigma))
        want = scipy.ndimage.gaussian_filter(img, sigma=sigma, mode="wrap")
        assert np.allclose(got, want, atol=1e-10), sigma


def test_foreground_model_statistics():
    box = _box(n=32)
    fg = ForegroundModel(box)
    amp_map = np.asarray(fg.realise_foreground_amp(57.0, 1.1, 10.0))
    assert amp_map.shape == (32, 32)
    # Monopole must survive (zero mode removed before adding monopole)
    assert np.isclose(amp_map.mean(), 10.0, atol=2.0)

    alpha = np.asarray(fg.realise_spectral_index(2.07, 2e-4, 15.0))
    assert np.isclose(alpha.mean(), 2.07, atol=1e-3)

    cube = np.asarray(fg.construct_cube(jnp.asarray(amp_map),
                                        jnp.asarray(alpha), freq_ref=130.0))
    assert cube.shape == (32, 32, 32)
    # Frequency scaling: cube[:,:,i]/amp = (freq_i/130)^alpha
    freqs = box.freq_array()
    want = amp_map * (freqs[5] / 130.0) ** alpha
    assert np.allclose(cube[:, :, 5], want, rtol=1e-5)


def test_foreground_scalar_spectral_index():
    box = _box()
    fg = ForegroundModel(box)
    amp = jnp.ones((16, 16))
    cube = np.asarray(fg.construct_cube(amp, 2.5, freq_ref=130.0))
    freqs = box.freq_array()
    assert np.allclose(cube[0, 0, :], (freqs / 130.0) ** 2.5, rtol=1e-5)


def test_point_source_model():
    box = _box(n=16)
    ps = PointSourceModel(box)
    # Empirical count model positive and steeply falling
    assert ps.number_count(0.1) > ps.number_count(1.0) > 0
    cube, tmean = ps.construct_cube(flux_cutoff=0.1, beta=-2.7,
                                    delta_beta=0.1, seed_clustering=1,
                                    seed_poisson=2)
    cube = np.asarray(cube)
    assert cube.shape == (16, 16, 16)
    assert np.all(np.isfinite(cube))
    assert tmean.shape == (16, 1)
    assert np.all(tmean > 0)


# ----------------------------------------------------------------------
# Halos
# ----------------------------------------------------------------------
def test_halo_count_field(cosmo_z0):
    box = _box(z=0.0, seed=5)
    box.realise_density()
    h = halos_mod.HaloDistribution(box, mass_range=(1e12, 1e15), mass_bins=10)
    counts = np.asarray(h.halo_count_field(box.delta_x, nbar=1e-3, bias=1.0))
    assert counts.shape == (16, 16, 16)
    assert counts.min() >= 0
    # Mean count ~ V_vox * nbar
    vox = box.grid.voxel_volume
    assert np.isclose(counts.mean(), vox * 1e-3, rtol=0.2)


def test_halo_catalogue_host():
    box = _box(z=0.0)
    counts = np.zeros((16, 16, 16), dtype=int)
    counts[1, 2, 3] = 2
    counts[5, 5, 5] = 1
    cat = halos_mod.halo_catalogue_host(counts, box.grid, scatter=False)
    assert cat.shape == (3, 3)
    dx = box.grid.Lx / 16
    rows = {tuple(np.round(r / dx).astype(int)) for r in cat}
    assert rows == {(1, 2, 3), (5, 5, 5)}


def test_halo_catalogue_padded():
    box = _box(z=0.0)
    counts = jnp.zeros((16, 16, 16), dtype=jnp.int32)
    counts = counts.at[1, 2, 3].set(2).at[5, 5, 5].set(1)
    pos, mask, n = halos_mod.realise_halo_catalogue_padded(
        jax.random.PRNGKey(0), counts, box.grid, max_halos=8, scatter=False)
    assert int(n) == 3
    assert int(mask.sum()) == 3
    dx = box.grid.Lx / 16
    got = {tuple(np.round(np.asarray(p) / dx).astype(int))
           for p, m in zip(pos, mask) if m}
    assert got == {(1, 2, 3), (5, 5, 5)}


def test_halo_lognormal_branch():
    box = _box(z=0.0, seed=7)
    box.realise_density()
    h = halos_mod.HaloDistribution(box, (1e12, 1e15), 10)
    counts = np.asarray(h.halo_count_field(box.delta_x, 1e-3, 1.5,
                                           lognormal=True))
    assert counts.min() >= 0
    assert np.all(np.isfinite(counts))


# ----------------------------------------------------------------------
# Beams
# ----------------------------------------------------------------------
def test_convolve_fft_matches_scipy(rng):
    beam = rng.random((8, 8, 4))
    field = rng.standard_normal((8, 8, 4))
    got = np.asarray(beams_mod.convolve_fft_cube(jnp.asarray(beam),
                                                 jnp.asarray(field)))
    want = scipy.signal.fftconvolve(beam, field, mode="same", axes=[0, 1])
    norm = beam.reshape(-1, 4).sum(axis=0)
    want = want / norm[None, None, :]
    assert np.allclose(got, want, atol=1e-10)


def test_convolve_wrap_matches_scipy(rng):
    beam = rng.random((8, 8, 2))
    field = rng.standard_normal((8, 8, 2))
    got = np.asarray(beams_mod.convolve_wrap_cube(jnp.asarray(beam),
                                                  jnp.asarray(field)))
    want = np.zeros_like(field)
    for i in range(2):
        want[:, :, i] = scipy.signal.convolve2d(
            beam[:, :, i], field[:, :, i], mode="same", boundary="wrap")
    norm = beam.reshape(-1, 2).sum(axis=0)
    want = want / norm[None, None, :]
    assert np.allclose(got, want, atol=1e-10)


def test_unit_beam_convolution_identity():
    box = _box()
    bm = beams_mod.BeamModel(box)
    field = jnp.ones((16, 16, 16))
    out = np.asarray(bm.convolve_real(field))
    # Unit beam, constant field: convolution preserves the constant
    assert np.allclose(out, 1.0, atol=1e-8)


def test_gaussian_beam_cube():
    box = _box()
    bm = beams_mod.GaussianBeamModel(box, dish_diameter=13.5)
    cube = np.asarray(bm.beam_cube())
    assert cube.shape == (16, 16, 16)
    assert np.all(cube > 0) and np.all(cube <= 1.0 + 1e-12)
    # Peak at the centre pixels
    c = cube[:, :, 8]
    assert c.max() == c[7:9, 7:9].max()


def test_cosine_beam_model():
    box = _box()
    bm = beams_mod.CosineBeamModel(box, dish_diameter=13.5)
    cube = np.asarray(bm.beam_cube())
    assert np.all(np.isfinite(cube))
    assert cube.max() <= 1.0 + 1e-9


def test_zernike_beam():
    # Z0 (piston) = 1 on the disc; Z1 = 2 rho sin(theta) = 2y (OSA norm-free)
    x = np.linspace(-0.9, 0.9, 11)
    y = np.zeros_like(x)
    z0 = np.asarray(beams_mod.zernike_eval([1.0], x, y))
    assert np.allclose(z0, 1.0)
    z1 = np.asarray(beams_mod.zernike_eval([0.0, 1.0, 0.0], x, y))
    # OSA j=1 -> (n=1, m=-1) -> rho sin(theta) = y = 0 along this cut
    assert np.allclose(z1, 0.0, atol=1e-12)
    z2 = np.asarray(beams_mod.zernike_eval([0.0, 0.0, 1.0], x, y))
    # OSA j=2 -> (n=1, m=+1) -> rho cos(theta) = x
    assert np.allclose(z2, x, atol=1e-12)
    # Outside the unit disc -> 0
    assert beams_mod.zernike_eval([1.0], np.array([1.5]), np.array([0.0]))[0] == 0.0
