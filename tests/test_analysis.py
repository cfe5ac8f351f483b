"""Analysis layer: datacube utils, voids, inpainting, forecasts."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.interpolate

from fastbox_tpu.analysis import datacube, forecast, inpaint, voids
from fastbox_tpu.box import CosmoBox, default_cosmo
from fastbox_tpu.utils import comoving_dimensions_from_survey


# ----------------------------------------------------------------------
# Datacube utilities
# ----------------------------------------------------------------------
def test_replace_nan_with_channel_mean(rng):
    f = rng.standard_normal((6, 6, 4))
    f[1, 2, 0] = np.nan
    f[3, 3, 2] = np.nan
    out = np.asarray(datacube.replace_nan_with_channel_mean(jnp.asarray(f)))
    assert np.all(np.isfinite(out))
    ch0 = f[:, :, 0].ravel()
    want = np.nanmean(ch0)
    assert np.isclose(out[1, 2, 0], want)


def test_interpolate_onto_grid_matches_scipy(rng):
    x = np.linspace(0.0, 1.0, 8)
    f = rng.standard_normal((8, 8, 8))
    xn = np.linspace(0.05, 0.95, 5)
    got = np.asarray(datacube.interpolate_onto_grid(
        jnp.asarray(f), (x, x, x), (xn, xn, xn)))
    interp = scipy.interpolate.RegularGridInterpolator(
        (x, x, x), f, method="linear", bounds_error=False, fill_value=np.nan)
    X, Y, Z = np.meshgrid(xn, xn, xn, indexing="ij")
    want = interp(np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)).reshape(X.shape)
    assert np.allclose(got, want, atol=1e-10)


def test_grid_catalogue_matches_histogramdd(rng):
    n = 500
    x, y, z = rng.random(n), rng.random(n), rng.random(n)
    w = rng.random(n)
    got, (xg, yg, zg) = datacube.grid_catalogue(x, y, z, w=w, nx=4, ny=5, nz=6,
                                               xlim=(0, 1), ylim=(0, 1),
                                               zlim=(0, 1))
    want, _ = np.histogramdd(np.vstack([x, y, z]).T, bins=(4, 5, 6),
                             range=[(0, 1), (0, 1), (0, 1)], weights=w)
    assert np.allclose(np.asarray(got), want, atol=1e-10)
    assert xg.size == 4 and yg.size == 5 and zg.size == 6


# ----------------------------------------------------------------------
# Voids
# ----------------------------------------------------------------------
def _void_field():
    """Two clear Gaussian depressions in a flat field."""
    n = 24
    xx, yy, zz = np.meshgrid(*(np.arange(n),) * 3, indexing="ij")
    f = np.zeros((n, n, n))
    for cx, cy, cz in [(6, 6, 6), (17, 17, 17)]:
        r2 = (xx - cx) ** 2 + (yy - cy) ** 2 + (zz - cz) ** 2
        f -= np.exp(-r2 / 18.0)
    return f


def test_watershed_finds_two_voids():
    f = _void_field()
    labels = voids.apply_watershed(f, mask_threshold=-0.05,
                                   merge_threshold=0.05, verbose=False)
    assert labels.shape == f.shape
    # Masked (high-density) region is 0; two basins found
    lbls = np.unique(labels)
    assert 0 in lbls
    assert len(lbls) >= 3  # 0 + at least two voids
    # The two minima belong to different labels
    assert labels[6, 6, 6] != labels[17, 17, 17]
    assert labels[6, 6, 6] > 0 and labels[17, 17, 17] > 0


def test_void_measurements():
    f = _void_field()
    labels = voids.apply_watershed(f, mask_threshold=-0.05,
                                   merge_threshold=0.05, verbose=False)
    box = CosmoBox(cosmo=default_cosmo, box_scale=(1e2,) * 3, nsamp=24,
                   realise_now=False)
    cat = voids.trim_by_volume(labels, nmin=10, nmax=10**6)
    cat = cat[cat > 0]
    assert cat.size >= 2

    cent = voids.void_centroid(cat, labels, box, field=f, kind="uniform")
    radii = voids.void_radii(cat, labels, box)
    assert set(cent) == set(cat.tolist())
    for lbl in cat:
        assert radii[lbl] > 0
    # Density-weighted + minimum centroids also work
    cmin = voids.void_centroid(cat, labels, box, field=f, kind="minimum")
    cden = voids.void_centroid(cat, labels, box, field=f, kind="density")
    # The minimum centroid of the first void is near voxel (6,6,6)
    lbl0 = labels[6, 6, 6]
    want = np.array([box.x[6], box.y[6], box.z[6]])
    assert np.allclose(cmin[lbl0], want)
    assert np.linalg.norm(cden[lbl0] - want) < 15.0

    stack, failures = voids.stack_voids(cat, labels, box, f, grid_pix=9)
    assert stack.shape == (9, 9, 9)


# ----------------------------------------------------------------------
# Inpainting
# ----------------------------------------------------------------------
def test_gcr_inpaints_flagged_channels(rng):
    nfreq, npix = 32, 3
    freqs = np.linspace(100.0, 132.0, nfreq)
    S = np.asarray(inpaint.simple_signal_cov(freqs, 1.0, 8.0))
    # Smooth signal drawn from S
    L = np.linalg.cholesky(S + 1e-8 * np.eye(nfreq))
    signal = (L @ rng.standard_normal((nfreq, npix))).T
    noise_var = 1e-4
    N = noise_var * np.eye(nfreq)
    d = signal + np.sqrt(noise_var) * rng.standard_normal((npix, nfreq))
    w = np.ones((npix, nfreq))
    w[:, 12:17] = 0.0  # flagged gap

    sol = np.asarray(inpaint.gaussian_cr_1d(d, w, S, N, realisations=4,
                                            add_noise=False,
                                            key=jax.random.PRNGKey(0)))
    assert sol.shape == (4, npix, nfreq)
    mean_sol = sol.mean(axis=0)
    # In-painted gap should be close to the true signal (high SNR case)
    err = np.abs(mean_sol[:, 12:17] - signal[:, 12:17])
    assert np.median(err) < 0.5


def test_trim_flagged_channels():
    w = np.array([1.0, 0.0, 1.0, 1.0])
    x = np.arange(4.0)
    assert np.array_equal(inpaint.trim_flagged_channels(w, x),
                          np.array([0.0, 2.0, 3.0]))
    M = np.arange(16.0).reshape(4, 4)
    Mt = inpaint.trim_flagged_channels(w, M)
    assert Mt.shape == (3, 3)
    assert Mt[0, 1] == M[0, 2]


def test_lssa_recovers_single_mode(rng):
    nfreq = 64
    freqs = np.linspace(100.0, 163.0, nfreq)  # MHz
    tau_grid = np.fft.fftfreq(nfreq, d=freqs[1] - freqs[0]) * 1e3  # ns
    n_true = 5
    A_true = 2.0 + 1.0j
    d = A_true * np.exp(2.0j * np.pi * tau_grid[n_true] * freqs / 1e3)
    # NOTE: reference model uses tau*freqs with tau in ns and freqs in MHz
    # => phase arg 2 pi tau nu; replicate with the same convention
    d = A_true * np.exp(2.0j * np.pi * (tau_grid[n_true] / 1e3) * freqs)
    invcov = np.eye(nfreq)
    tau, A_re, A_im = inpaint.lssa_fit_modes(
        jnp.asarray(d), jnp.asarray(freqs / 1e3), invcov=jnp.asarray(invcov),
        fit_amp_phase=False, tau=jnp.asarray(tau_grid))
    # The matched mode recovers the complex amplitude
    assert np.isclose(float(A_re[n_true]), A_true.real, atol=1e-6)
    assert np.isclose(float(A_im[n_true]), A_true.imag, atol=1e-6)

    ps = np.asarray(inpaint.lssa_pspec(A_re, A_im, np.ones(nfreq), tau_grid,
                                       freqs))
    assert np.argmax(ps) == n_true


def test_lssa_decorr_matrix_orthogonal():
    w = np.ones(32)
    freqs = np.linspace(100.0, 131.0, 32)
    rot, eig = inpaint.lssa_decorr_matrix(w, 50.0, freqs)
    rot = np.asarray(rot)
    assert np.allclose(rot @ rot.T, np.eye(2), atol=1e-10)
    assert np.all(np.asarray(eig) >= -1e-8)


# ----------------------------------------------------------------------
# Forecasts + survey utils
# ----------------------------------------------------------------------
def test_forecast_pipeline():
    cosmo = default_cosmo
    ells = np.arange(10, 300, 10).astype(float)

    t_gal = forecast.tracer_spectro(cosmo, 0.7, 0.9, "galaxy")
    t_im = forecast.tracer_spectro(cosmo, 0.7, 0.9, "im")

    cl_gal = forecast.angular_cl(cosmo, t_gal, t_gal, ells)
    cl_im = forecast.angular_cl(cosmo, t_im, t_im, ells)
    cl_x = forecast.angular_cl(cosmo, t_gal, t_im, ells)
    assert np.all(cl_gal > 0) and np.all(cl_im > 0) and np.all(cl_x > 0)
    # Cross bounded by the autos (Cauchy-Schwarz)
    assert np.all(cl_x**2 <= cl_gal * cl_im * (1.0 + 1e-8))

    Nell = forecast.noise_im(cosmo, forecast.inst_meerkatuhf, ells, 0.7, 0.9)
    assert Nell.shape == (ells.size, 1)
    assert np.all(Nell > 0)
    Nell_int = forecast.noise_im(cosmo, forecast.inst_hirax, ells, 0.7, 0.9)
    assert np.any(Nell_int >= forecast.INF_NOISE * 0.9)  # low-ell cut

    ngal = forecast.number_density_to_area_density(cosmo, 1e-3, 0.7, 0.9)
    assert ngal > 0
    Ngal_shot = 1.0 / ngal

    F = forecast.fisher_bandpowers(ells, 10.0, 0.1, cl_gal, cl_im, cl_x,
                                   Ngal_shot, Nell[:, 0])
    assert np.all(F > 0)


def test_forecast_scalars():
    assert forecast.sigmaT(forecast.inst_gbt) > 0
    assert 0.05 < forecast.Tb(0.8) < 0.3
    assert 0.5 < forecast.bias_HI(0.8) < 1.5
    assert np.isclose(forecast.bias_gal(0.8), np.sqrt(1.8))
    assert forecast.lmax_for_redshift(default_cosmo, 0.8) > 0
    assert forecast.lmin_for_redshift(default_cosmo, 0.8, 6.0) > 0


def test_comoving_dimensions_from_survey():
    zc, (Lx, Ly, Lz) = comoving_dimensions_from_survey(
        default_cosmo, (10.0, 30.0), z_range=(0.7, 0.9))
    assert 0.7 < zc < 0.9
    assert Ly > Lx > 0 and Lz > 0
    # Same via frequency range
    f_hi = 1420.405752 / 1.7
    f_lo = 1420.405752 / 1.9
    zc2, dims2 = comoving_dimensions_from_survey(
        default_cosmo, (10.0, 30.0), freq_range=(f_hi, f_lo))
    assert np.isclose(zc2, zc, rtol=1e-6)
