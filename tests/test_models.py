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


# ----------------------------------------------------------------------
# Planck Sky Model (pure math + stub-healpy geometry)
# ----------------------------------------------------------------------
def test_planck_corr_math():
    """T_CMB -> T_RJ correction (reference foregrounds.py:483-497)."""
    from fastbox_tpu.constants import CMB_TEMP, H_PLANCK, KBOLTZ
    from fastbox_tpu.models.foregrounds import PlanckSkyModel

    # Rayleigh-Jeans limit: x = h nu / (k T) -> 0 gives corr -> 1, with the
    # independent small-x expansion corr = 1 + x^2/12 + O(x^4)
    for ghz in (0.05, 0.5, 2.0):
        x = H_PLANCK * ghz * 1e9 / (KBOLTZ * CMB_TEMP)
        got = PlanckSkyModel.planck_corr(ghz)
        assert np.isclose(got, 1.0 + x**2 / 12.0, rtol=1e-5), ghz
    # Monotonic growth toward the Wien side; sane magnitudes at the two
    # Planck bands the model ingests
    c217 = PlanckSkyModel.planck_corr(217.0)
    c353 = PlanckSkyModel.planck_corr(353.0)
    assert 1.0 < c217 < c353
    # Direct evaluation cross-check with scipy's CODATA constants
    import scipy.constants as sc

    x = sc.h * 217e9 / (sc.k * CMB_TEMP)
    want = (np.exp(x) - 1.0) ** 2 / (x**2 * np.exp(x))
    assert np.isclose(c217, want, rtol=1e-3)


def test_planck_assemble_cube_matches_numpy(rng):
    from fastbox_tpu.models.foregrounds import PlanckSkyModel

    n, nf = 6, 9
    sync = 10.0 + rng.random((n, n))
    free = 2.0 + rng.random((n, n))
    sidx = -3.0 + 0.1 * rng.standard_normal((n, n))
    freqs = np.linspace(400.0, 800.0, nf)
    got = np.asarray(PlanckSkyModel.assemble_cube(
        jnp.asarray(sync), jnp.asarray(free), jnp.asarray(sidx),
        jnp.asarray(freqs), 1000.0, -2.1))
    x = freqs / 1000.0
    want = (sync[:, :, None] * x[None, None, :] ** sidx[:, :, None]
            + free[:, :, None] * x[None, None, :] ** (-2.1))
    assert np.allclose(got, want, rtol=1e-12, atol=1e-12)


def _healpy_stub(nside, rng):
    """Minimal fake healpy exposing what PlanckSkyModel touches."""
    import types

    npix = 12 * nside**2
    maps = {
        "ff217": 1.0 + rng.random(npix),
        "sync217": 5.0 + rng.random(npix),
        "sync353": 2.0 + rng.random(npix),
    }
    calls = {"gnomview": []}
    hp = types.ModuleType("healpy")
    hp._maps = maps
    hp._calls = calls
    hp.get_nside = lambda m: int(np.sqrt(m.size / 12))
    resol_arcmin = np.degrees(np.sqrt(4.0 * np.pi / npix)) * 60.0
    hp.nside2resol = lambda ns, arcmin=False: (
        resol_arcmin if arcmin else np.radians(resol_arcmin / 60.0))

    hp.fitsfunc = types.SimpleNamespace(
        read_map=lambda path, field=0, nest=False: maps[path])
    hp.sphtfunc = types.SimpleNamespace(
        synfast=lambda cls, ns: np.zeros(12 * ns**2))

    def gnomview(m, **kw):
        calls["gnomview"].append(kw)
        xs, ys = kw["xsize"], kw["ysize"]
        return m[: xs * ys].reshape(ys, xs)

    hp.visufunc = types.SimpleNamespace(gnomview=gnomview)
    return hp


def test_planck_sky_model_stubbed_geometry(rng, monkeypatch):
    """Exercise the healpy-gated projection path end to end with a stub,
    checking map/cube shapes and the mK conversion (foregrounds.py:523-681)."""
    import sys

    from fastbox_tpu.models.foregrounds import PlanckSkyModel

    hp = _healpy_stub(nside=8, rng=rng)
    monkeypatch.setitem(sys.modules, "healpy", hp)

    box = _box(n=8)
    psm = PlanckSkyModel(box, planck_sim_paths={
        "ff217": "ff217", "sync217": "sync217", "sync353": "sync353"})

    sync_amp, free_amp, sync_idx = psm.synch_freefree_maps(seed_syncidx=0)
    assert sync_amp.shape == free_amp.shape == sync_idx.shape == (8, 8)
    assert np.isfinite(sync_amp).all() and np.isfinite(free_amp).all()
    # Amplitude maps come back in mK (x1e3); the index map does not
    assert (sync_amp > 0).all() and (free_amp > 0).all()
    # Expected synch index from the stub maps INCLUDING the T_CMB -> T_RJ
    # correction applied at read time (foregrounds.py:483-520): the 353 GHz
    # band is divided by a ~4x larger correction than 217 GHz, steepening
    # the raw [2,3]/[5,6] map ratio
    c217 = PlanckSkyModel.planck_corr(217.0)
    c353 = PlanckSkyModel.planck_corr(353.0)
    exp_idx = (np.log((hp._maps["sync353"] / c353)
                      / (hp._maps["sync217"] / c217))
               / np.log(353.0 / 217.0))
    # (cubic-spline resampling in project() can over/undershoot a little)
    assert exp_idx.min() - 1.0 < sync_idx.mean() < exp_idx.max() + 1.0

    # Projection geometry: gnomview asked for the rotation we passed and a
    # projected patch wide enough for the 54.1 deg field at map resolution
    kw = hp._calls["gnomview"][0]
    assert kw["rot"] == (0.0, -62.0, 0.0)
    resol = hp.nside2resol(8, arcmin=True)
    assert kw["xsize"] == int(np.ceil(54.1 * 60.0 / resol))

    cube = np.asarray(psm.construct_cube(seed_syncidx=0))
    assert cube.shape == (8, 8, 8)
    assert np.isfinite(cube).all() and (cube > 0).all()
    # The cube must equal the pure-math assembly of the same maps
    freqs = box.freq_array()
    want = np.asarray(PlanckSkyModel.assemble_cube(
        jnp.asarray(sync_amp), jnp.asarray(free_amp), jnp.asarray(sync_idx),
        jnp.asarray(freqs), 1000.0, psm.free_idx))
    assert np.allclose(cube, want, rtol=1e-12)
