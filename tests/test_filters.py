"""Foreground-cleaning filters vs oracle/analytic expectations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from fastbox_tpu import filters


def _mock_cube(rng, n=12, nfreq=16):
    """FG-dominated cube: smooth power-law spectra + small noise."""
    freqs = np.linspace(100.0, 150.0, nfreq)
    amp = 50.0 + 10.0 * rng.standard_normal((n, n))
    beta = -2.7 + 0.01 * rng.standard_normal((n, n))
    fg = amp[:, :, None] * (freqs / freqs[0])[None, None, :] ** beta[:, :, None]
    sig = 0.1 * rng.standard_normal((n, n, nfreq))
    return fg + sig


def test_pca_matches_oracle(rng):
    cube = _mock_cube(rng)
    got = np.asarray(filters.pca_filter(jnp.asarray(cube), nmodes=3))
    want = oracle.pca_filter(cube, nmodes=3)
    assert np.allclose(got, want, rtol=1e-8, atol=1e-8)


def test_pca_return_filter(rng):
    cube = _mock_cube(rng)
    cleaned, U, amps = filters.pca_filter(jnp.asarray(cube), 2,
                                          return_filter=True)
    assert U.shape == (cube.shape[-1], 2)
    assert amps.shape == (2, cube.shape[0] * cube.shape[1])
    # U columns orthonormal
    assert np.allclose(np.asarray(U.T @ U), np.eye(2), atol=1e-10)


def test_pca_subspace_approximates_eigh(rng):
    # The FG here is ~rank-2, so mode 3 is quasi-degenerate with the noise
    # floor: the subspace variant agrees with exact eigh to the degenerate-
    # mode amplitude (documented approximation), not to machine precision.
    cube = _mock_cube(rng)
    exact = np.asarray(filters.pca_filter(jnp.asarray(cube), nmodes=3))
    sub = np.asarray(filters.pca_filter_subspace(jnp.asarray(cube), nmodes=3,
                                                 iters=32))
    rms = np.sqrt(np.mean(cube**2))
    assert np.abs(sub - exact).max() < 1e-2 * rms
    # With a clean rank split (2 dominant modes), agreement is tight
    exact2 = np.asarray(filters.pca_filter(jnp.asarray(cube), nmodes=2))
    sub2 = np.asarray(filters.pca_filter_subspace(jnp.asarray(cube), nmodes=2,
                                                  iters=32))
    assert np.abs(sub2 - exact2).max() < 1e-6 * rms


def test_mean_spectrum_filter(rng):
    cube = _mock_cube(rng)
    out = np.asarray(filters.mean_spectrum_filter(jnp.asarray(cube)))
    means = out.reshape(-1, cube.shape[-1]).mean(axis=0)
    assert np.allclose(means, 0.0, atol=1e-10)


def test_ica_filter_equals_pca_projection(rng):
    # FastICA reconstruction spans the top-n principal subspace, so the
    # cleaned field must match PCA's cleaned field.
    cube = _mock_cube(rng)
    ica = np.asarray(filters.ica_filter(jnp.asarray(cube), 3,
                                        key=jax.random.PRNGKey(0)))
    pca = np.asarray(filters.pca_filter(jnp.asarray(cube), 3))
    rms = np.sqrt(np.mean(cube**2))
    assert np.allclose(ica, pca, atol=1e-6 * rms)


def test_nmf_filter_reduces_foregrounds(rng):
    cube = _mock_cube(rng)
    assert np.all(cube > 0)
    cleaned = np.asarray(filters.nmf_filter(jnp.asarray(cube), 3,
                                            max_iter=300))
    # FG power removed: residual rms far below input rms
    assert np.sqrt(np.mean(cleaned**2)) < 0.05 * np.sqrt(np.mean(cube**2))


def test_kpca_legacy_reduces_foregrounds(rng):
    cube = _mock_cube(rng, n=8)
    cleaned = np.asarray(filters.kernel_pca_filter_legacy(jnp.asarray(cube), 3))
    d = cube.reshape(-1, cube.shape[-1]).T
    x = d - d.mean(axis=1, keepdims=True)
    assert np.sqrt(np.mean(cleaned**2)) < 0.5 * np.sqrt(np.mean(x**2))


def _sklearn_kpca(cube, nmodes, **kw):
    """sklearn KernelPCA fit on the mean-subtracted (Npix, Nfreq) samples."""
    from sklearn.decomposition import KernelPCA

    d = cube.reshape(-1, cube.shape[-1]).T
    x = d - d.mean(axis=1, keepdims=True)
    tr = KernelPCA(n_components=nmodes, fit_inverse_transform=True, **kw)
    x_trans = tr.fit_transform(x.T)
    return x, x_trans, tr


def test_kpca_legacy_matches_sklearn(rng):
    """Legacy variant == sklearn fit/inverse_transform/subtract
    (reference filters.py:309-370)."""
    cube = _mock_cube(rng, n=8)
    for kw, ours_kw in [({"kernel": "linear"}, {"kernel": "linear"}),
                        ({"kernel": "rbf", "gamma": 0.3},
                         {"kernel": "rbf", "gamma": 0.3})]:
        x, x_trans, tr = _sklearn_kpca(cube, 3, **kw)
        want = (x - tr.inverse_transform(x_trans).T).T.reshape(cube.shape)
        got = np.asarray(filters.kernel_pca_filter_legacy(
            jnp.asarray(cube), 3, **ours_kw))
        scale = np.sqrt(np.mean(x**2))
        assert np.allclose(got, want, atol=1e-8 * scale), kw


def test_kpca_nonlegacy_matches_reference_math(rng):
    """Non-legacy variant == the reference's manual smallest-retained-mode
    inverse transform (filters.py:294-300), oracled via sklearn internals."""
    cube = _mock_cube(rng, n=8)
    for kw in [{"kernel": "linear"}, {"kernel": "rbf", "gamma": 0.3}]:
        x, x_trans, tr = _sklearn_kpca(cube, 3, **kw)
        # Reference lines 296-300 (modern sklearn names: alphas_ ->
        # eigenvectors_, lambdas_ -> eigenvalues_)
        X = tr.eigenvectors_[:, -1:] * np.sqrt(tr.eigenvalues_[-1:])
        K = tr._get_kernel(X, tr.X_transformed_fit_[:, -1:])
        n_samples = tr.X_transformed_fit_.shape[0]
        K.flat[::n_samples + 1] += tr.alpha
        want = np.dot(K, tr.dual_coef_).reshape(cube.shape)
        got = np.asarray(filters.kernel_pca_filter(jnp.asarray(cube), 3, **kw))
        scale = np.sqrt(np.mean(x**2))
        assert np.allclose(got, want, atol=1e-7 * scale), kw


def test_kpca_variants_distinct(rng):
    cube = _mock_cube(rng, n=8)
    leg = np.asarray(filters.kernel_pca_filter_legacy(jnp.asarray(cube), 3))
    non = np.asarray(filters.kernel_pca_filter(jnp.asarray(cube), 3))
    assert not np.allclose(leg, non)


def test_angular_bandpass_filter(rng):
    cube = rng.standard_normal((16, 16, 4))
    out = np.asarray(filters.angular_bandpass_filter(jnp.asarray(cube),
                                                     0.1, 0.3).real)
    # oracle: direct numpy masking
    fk = np.fft.fftn(cube, axes=[0, 1])
    kx = np.fft.fftfreq(16)
    k = np.sqrt(kx[:, None] ** 2 + kx[None, :] ** 2)
    fk[~((k >= 0.1) & (k < 0.3))] *= 0.0
    want = np.fft.ifftn(fk, axes=[0, 1]).real
    assert np.allclose(out, want, atol=1e-10)


def test_bandpower_pca_filter_runs(rng):
    cube = _mock_cube(rng)
    out = np.asarray(filters.bandpower_pca_filter(jnp.asarray(cube), 3, 2))
    assert out.shape == cube.shape
    assert np.all(np.isfinite(out))


def test_gpr_filter_removes_smooth_component(rng):
    cube = _mock_cube(rng, n=6, nfreq=24)
    cleaned = np.asarray(filters.gpr_filter(jnp.asarray(cube), nsteps=300))
    d = cube.reshape(-1, cube.shape[-1]).T
    x = d - d.mean(axis=1, keepdims=True)
    # The smooth FG dominates x; GPR should strip most of it
    assert np.sqrt(np.mean(cleaned**2)) < 0.5 * np.sqrt(np.mean(x**2))


def test_gpr_filter_custom_kernels_and_restarts(rng):
    """Structured kernel specs + optimizer restarts (reference
    filters.py:508-518, 580-581: GPy kernel list + optimize_restarts)."""
    cube = _mock_cube(rng, n=6, nfreq=24)
    d = cube.reshape(-1, cube.shape[-1]).T
    x = d - d.mean(axis=1, keepdims=True)
    var = float(np.var(x))
    specs = [
        filters.KernelSpec("matern52", (1e-4 * var, 1e2 * var), (1e-3, 1e2)),
        filters.KernelSpec("exponential", (1e-14 * var, 1e-4 * var),
                           (1e-6, 1e-3)),
    ]
    cleaned, params = filters.gpr_filter(
        jnp.asarray(cube), kernels=specs, opt_num_restarts=2, nsteps=200,
        return_filter=True)
    assert np.sqrt(np.mean(np.asarray(cleaned) ** 2)) \
        < 0.5 * np.sqrt(np.mean(x**2))
    assert set(params) == {"matern52_var", "matern52_ls", "exponential_var",
                           "exponential_ls", "noise_var"}
    # The fitted FG variance must respect its bounds
    assert 1e-4 * var <= params["matern52_var"] <= 1e2 * var

    # Non-spec kernels are rejected loudly (no silent fallback)
    import pytest

    with pytest.raises(TypeError):
        filters.gpr_filter(jnp.asarray(cube), kernels=["rbf"])


def test_gpr_filter_closed_form_oracle(rng):
    """Pin the GPR *math*, not just behaviour: with FIXED hyperparameters
    the posterior mean is exact linear algebra, so compare gpr_filter
    against an independent numpy f64 GP posterior at 1e-8.

    Model (reference filters.py:553-589): frequencies on [0,1], total
    covariance K_tot = K_fg + K_sig + noise*I, foreground posterior mean
    m_fg = K_fg K_tot^{-1} x (include_likelihood=False), cleaned = x - m_fg
    on the per-pixel mean-subtracted (Nfreq, Npix) matrix.
    """
    n, nfreq = 5, 20
    cube = _mock_cube(rng, n=n, nfreq=nfreq).astype(np.float64)
    var_fg, ls_fg = 2.5, 0.4
    var_sig, ls_sig = 1e-3, 5e-3
    noise_var = 1e-2
    specs = [
        filters.KernelSpec("rbf", (1e-8, 1e8)),
        filters.KernelSpec("exponential", (1e-8, 1e8), (1e-6, 1e2)),
    ]
    cleaned, params = filters.gpr_filter(
        jnp.asarray(cube), kernels=specs,
        fixed_params=[var_fg, ls_fg, var_sig, ls_sig, noise_var],
        return_filter=True)
    assert params["rbf_var"] == var_fg and params["noise_var"] == noise_var

    # Independent numpy oracle
    d = cube.reshape(-1, nfreq).T
    x = d - d.mean(axis=1, keepdims=True)
    nu = np.linspace(0.0, 1.0, nfreq)
    dist = np.abs(nu[:, None] - nu[None, :])
    K_fg = var_fg * np.exp(-0.5 * (dist / ls_fg) ** 2)
    K_sig = var_sig * np.exp(-dist / ls_sig)
    K_tot = K_fg + K_sig + noise_var * np.eye(nfreq)
    m_fg = K_fg @ np.linalg.solve(K_tot, x)
    want = (x - m_fg).T.reshape(cube.shape)
    assert np.allclose(np.asarray(cleaned), want, rtol=1e-8, atol=1e-10)

    # The posterior mean must capture essentially all of the smooth FG
    # (sanity that the fixture actually exercises the subtraction)
    assert np.sqrt(np.mean(want ** 2)) < 0.5 * np.sqrt(np.mean(x ** 2))

    with pytest.raises(ValueError):
        filters.gpr_filter(jnp.asarray(cube), kernels=specs,
                           fixed_params=[1.0, 2.0])


def test_fastica_unmixes_known_sources(rng):
    """Direct FastICA validation: recover 3 independent non-Gaussian
    sources from a random mixture, up to permutation and sign."""
    nsamp = 4000
    s1 = np.sign(rng.standard_normal(nsamp))          # Bernoulli +-1
    s2 = rng.uniform(-np.sqrt(3), np.sqrt(3), nsamp)  # uniform
    s3 = rng.laplace(0.0, 1.0 / np.sqrt(2.0), nsamp)  # Laplace
    S = np.stack([s1, s2, s3])                        # (3, nsamp), unit var
    A = rng.standard_normal((3, 3)) + 3.0 * np.eye(3) # well-conditioned mix
    X = A @ S                                         # (features, samples)

    W, K, mean = filters.fastica(jnp.asarray(X), jax.random.PRNGKey(3),
                                 n_components=3, max_iter=500)
    rec = np.asarray((W @ K) @ (jnp.asarray(X) - mean))  # recovered sources

    # Correlation matrix between recovered and true sources must be a
    # signed permutation: every true source matched by exactly one
    # recovered component with |corr| ~ 1.
    C = np.corrcoef(np.vstack([rec, S]))[:3, 3:]      # (rec, true)
    best = np.abs(C).max(axis=0)
    assert (best > 0.95).all(), C
    # One-to-one: each recovered component claims a distinct true source
    assert sorted(np.abs(C).argmax(axis=1)) == [0, 1, 2], C


def test_lsq_synchrotron_fit_recovers_params(rng):
    nfreq, npix = 16, 32
    freqs = np.linspace(100.0, 200.0, nfreq)
    beta_true = -2.8 + 0.05 * rng.standard_normal(npix)
    amp_true = 40.0 + 5.0 * rng.random(npix)
    x = freqs / freqs[0]
    data = amp_true[:, None] * x[None, :] ** beta_true[:, None]
    noise = np.ones_like(data)
    out = filters.lsq_synchrotron_fit(jnp.asarray(data), jnp.asarray(noise),
                                      jnp.asarray(freqs), freeind=-2.1)
    # Model should reproduce the (noise-free) data well
    resid = np.asarray(out["model"]) - data
    assert np.sqrt(np.mean(resid**2)) < 0.05 * np.sqrt(np.mean(data**2))
