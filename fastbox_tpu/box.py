"""``CosmoBox`` — the reference-compatible object API over the functional core.

The reference's ``CosmoBox`` (box.py:23-948) is a mutable numpy object that
realises fields in place and calls the CCL C library at run time.  Here the
object is a thin shim: geometry lives in an immutable :class:`GridSpec`,
cosmology in precomputed :class:`Cosmology` tables, randomness in an explicit
``jax.random`` key chain (replacing global ``np.random.seed`` state), and
every method dispatches to jit-compiled functional kernels cached per
configuration.  Field state (``delta_x``, ``delta_k``, ``velocity_k``,
``phi_k``) is stored on the object for API familiarity, as device arrays.

For maximum throughput (Monte-Carlo ensembles, multi-chip sharding) use
:mod:`fastbox_tpu.pipeline` directly; this class is the ergonomic entry point.
"""
from __future__ import annotations

from functools import cached_property

import jax
import jax.numpy as jnp
from .ops import fft_safe
import numpy as np
from scipy.integrate import simpson

from .cosmology import Cosmology, CosmoParams, as_cosmo_params, build_cosmology
from .fields import gaussian, transforms
from .grid import GridSpec
from .ops import rsd as rsd_ops
from .ops import spectra as spectra_ops

__all__ = ["CosmoBox", "default_cosmo"]

# Reference default cosmology (box.py:18-20); 'transfer_function' is implicit.
default_cosmo = dict(Omega_c=0.25, Omega_b=0.05, h=0.7, n_s=0.95, sigma8=0.8)


class CosmoBox:
    def __init__(self, cosmo, box_scale=1e3, nsamp=32, redshift=0.0,
                 line_freq=1420.405752, realise_now=True, seed=0, dtype=None):
        """Initialise a box containing a matter distribution (box.py:25-107).

        Parameters:
            cosmo: CosmoParams or a reference-style dict.
            box_scale: side length in Mpc, or an (Lx, Ly, Lz) tuple.
            nsamp: grid points per dimension.
            redshift: redshift of the box centre.
            line_freq: emission-line rest frequency, MHz.
            realise_now: realise density/velocity/potential immediately.
            seed: integer seed for the box's PRNG key chain (the explicit
                replacement for the reference's np.random.seed global state).
            dtype: real dtype of fields (default float64 under jax x64,
                else float32).
        """
        if not isinstance(cosmo, (dict, CosmoParams)):
            raise TypeError("`cosmo` must be a CosmoParams object or dict.")
        self.cosmo = as_cosmo_params(cosmo)

        self.grid = GridSpec.create(box_scale=box_scale, nsamp=nsamp,
                                    redshift=redshift, line_freq=line_freq)
        self.dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                               else jnp.float32)
        self._key = jax.random.PRNGKey(seed)
        self._cosmology_cache: dict[float, Cosmology] = {}
        self._jit_cache: dict = {}

        self.delta_x = None
        self.delta_k = None
        self.velocity_k = None
        self.phi_k = None

        if realise_now:
            self.realise_density()
            self.realise_velocity()
            self.realise_potential()

    # ------------------------------------------------------------------
    # Plumbing
    # ------------------------------------------------------------------
    def next_key(self):
        """Advance and return the box's PRNG key."""
        self._key, sub = jax.random.split(self._key)
        return sub

    def set_seed(self, seed: int):
        self._key = jax.random.PRNGKey(seed)

    def cosmology_at(self, redshift=None) -> Cosmology:
        """Cosmology tables at a given redshift (cached)."""
        z = self.redshift if redshift is None else float(redshift)
        if z not in self._cosmology_cache:
            self._cosmology_cache[z] = build_cosmology(self.cosmo, z)
        return self._cosmology_cache[z]

    @property
    def cosmology(self) -> Cosmology:
        return self.cosmology_at(None)

    # ------------------------------------------------------------------
    # Reference-compatible geometry attributes
    # ------------------------------------------------------------------
    @property
    def N(self):
        return self.grid.N

    @property
    def redshift(self):
        return self.grid.redshift

    @property
    def scale_factor(self):
        return self.grid.scale_factor

    @property
    def line_freq(self):
        return self.grid.line_freq

    @property
    def Lx(self):
        return self.grid.Lx

    @property
    def Ly(self):
        return self.grid.Ly

    @property
    def Lz(self):
        return self.grid.Lz

    @property
    def x(self):
        return self.grid.x

    @property
    def y(self):
        return self.grid.y

    @property
    def z(self):
        return self.grid.z

    @property
    def boxfactor(self):
        return self.grid.boxfactor

    @property
    def kmin(self):
        return self.grid.kmin

    @property
    def kmax(self):
        return self.grid.kmax

    @cached_property
    def k(self):
        """|k| grid (box.py:125-127). Materialised only on access."""
        return np.asarray(self.grid.kmag(jnp.float64))

    @cached_property
    def Kx(self):
        """Integer FFT index grids (box.py:116-123). Materialised on access."""
        return np.broadcast_to(
            self.grid.fft_index[:, None, None].astype(np.float64), self.grid.shape
        ).copy()

    @cached_property
    def Ky(self):
        return np.broadcast_to(
            self.grid.fft_index[None, :, None].astype(np.float64), self.grid.shape
        ).copy()

    @cached_property
    def Kz(self):
        return np.broadcast_to(
            self.grid.fft_index[None, None, :].astype(np.float64), self.grid.shape
        ).copy()

    # ------------------------------------------------------------------
    # Realisation engine (L2)
    # ------------------------------------------------------------------
    def _jitted(self, name, factory):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(factory())
        return self._jit_cache[name]

    def realise_density(self, linear=False, redshift=None, inplace=True):
        """Gaussian density realisation (box.py:130-194)."""
        z = self.redshift if redshift is None else redshift
        cosmology = self.cosmology_at(z)
        grid, dtype = self.grid, self.dtype

        fn = self._jitted(
            ("density", z, bool(linear)),
            lambda: (lambda key: gaussian.realise_density(
                key, grid, cosmology, linear=linear, dtype=dtype)),
        )
        delta_x, delta_k = fn(self.next_key())
        if inplace:
            if z != self.redshift:
                print("Warning: Storing density field into self.delta_x with a "
                      "different redshift than self.redshift.")
            self.delta_x, self.delta_k = delta_x, delta_k
        return delta_x

    def realise_density_from_whitenoise(self, white, linear=False, redshift=None,
                                        inplace=True):
        """Colour caller-supplied complex white noise (for reproducibility
        tests against the numpy oracle, and for matched-seed ensembles)."""
        z = self.redshift if redshift is None else redshift
        cosmology = self.cosmology_at(z)
        pk_fn = cosmology.pk_lin if linear else cosmology.pk_nl
        delta_x, delta_k = gaussian.gaussian_field_from_whitenoise(
            jnp.asarray(white), self.grid, pk_fn
        )
        if inplace:
            self.delta_x, self.delta_k = delta_x, delta_k
        return delta_x

    def realise_velocity(self, delta_x=None, delta_k=None, redshift=None,
                         inplace=True):
        """Linear velocity field in Fourier space (box.py:197-290)."""
        if delta_x is not None and delta_k is not None:
            raise ValueError("delta_x and delta_k specified; can only specify one")
        if delta_x is not None:
            delta_k = fft_safe.fftn(jnp.asarray(delta_x))
        if delta_k is None:
            delta_k = self.delta_k
        z = self.redshift if redshift is None else redshift
        cosmology = self.cosmology_at(z)
        v = gaussian.realise_velocity(delta_k, self.grid, cosmology)
        velocity_k = (v[0], v[1], v[2])
        if inplace:
            self.velocity_k = velocity_k
        return velocity_k

    def realise_potential(self, delta_x=None, delta_k=None, redshift=None,
                          inplace=True, apply_prefactor=False):
        """Potential field phi_k = delta_k / k^2 (box.py:293-353).

        The reference never applies its physical prefactor (box.py:343-347);
        pass ``apply_prefactor=True`` for the intended physics.
        """
        if delta_x is not None and delta_k is not None:
            raise ValueError("delta_x and delta_k specified; can only specify one")
        if delta_x is not None:
            delta_k = fft_safe.fftn(jnp.asarray(delta_x))
        if delta_k is None:
            delta_k = self.delta_k
        z = self.redshift if redshift is None else redshift
        cosmology = self.cosmology_at(z)
        phi_k = gaussian.realise_potential(delta_k, self.grid, cosmology,
                                           apply_prefactor=apply_prefactor)
        if inplace:
            self.phi_k = phi_k
        return phi_k

    def realise_density_cola(self, redshift=None, redshift_init=15.0,
                             keep_velocities=True, seed=None, inplace=True,
                             n_steps=None):
        """2LPT+COLA approximate N-body realisation (box.py:463-589).

        Native replacement for the reference's pycola3 path: the whole
        evolution is a jitted lax.scan (see fields/cola.py).  Returns
        ``delta_x`` or ``(delta_x, vel_x, vel_y, vel_z)`` like the reference.
        """
        from .fields.cola import realise_density_cola as _cola

        z = self.redshift if redshift is None else redshift
        key = jax.random.PRNGKey(seed) if seed is not None else self.next_key()
        delta_x, vel = _cola(key, self.grid, self.cosmology_at(z), redshift=z,
                             redshift_init=redshift_init, n_steps=n_steps,
                             dtype=self.dtype, keep_velocities=keep_velocities)
        if inplace:
            self.delta_x = delta_x
            self.delta_k = fft_safe.fftn(delta_x)
        if keep_velocities:
            return delta_x, vel[0], vel[1], vel[2]
        return delta_x

    # ------------------------------------------------------------------
    # Transforms (L3)
    # ------------------------------------------------------------------
    def lognormal(self, delta_x):
        """Log-normal transform (box.py:441-460)."""
        return transforms.lognormal(jnp.asarray(delta_x))

    def apply_transfer_fn(self, field_k, transfer_fn):
        """Anisotropic (k_perp, k_par) transfer function (box.py:356-381)."""
        return transforms.apply_transfer_fn(jnp.asarray(field_k), self.grid,
                                            transfer_fn)

    def smooth_field(self, field_k, R):
        """Top-hat smoothing; R in Mpc/h (box.py:635-655)."""
        return transforms.smooth_field(jnp.asarray(field_k), self.grid, R,
                                       self.cosmo.h)

    def window(self, k, R):
        return transforms.window(jnp.asarray(k), R)

    def window1(self, k, R):
        return transforms.window1(jnp.asarray(k), R)

    def redshift_space_density(self, delta_x=None, velocity_z=None, sigma_nl=0.0,
                               method="linear"):
        """RSD remap of a density cube (box.py:384-438), vmapped over all LOS."""
        cosmology = self.cosmology
        Hz = 100.0 * self.cosmo.h * cosmology.Ea
        key = self.next_key() if sigma_nl > 0.0 else None
        return rsd_ops.redshift_space_density(
            jnp.asarray(delta_x), jnp.asarray(velocity_z), self.grid, Hz,
            sigma_nl=sigma_nl, key=key, method=method,
        )

    # ------------------------------------------------------------------
    # Estimators (L5)
    # ------------------------------------------------------------------
    def binned_power_spectrum(self, delta_x=None, delta_k=None, nbins=20,
                              kbins=None):
        """Binned 1D P(k) (box.py:696-768)."""
        if delta_x is not None and delta_k is not None:
            raise ValueError("delta_x and delta_k specified; can only specify one")
        if delta_x is not None:
            delta_k = fft_safe.fftn(jnp.asarray(delta_x))
        if delta_k is None:
            delta_k = self.delta_k
        return spectra_ops.binned_power_spectrum(self.grid, delta_k=delta_k,
                                                 nbins=nbins, kbins=kbins)

    def theoretical_power_spectrum(self):
        """Theory nonlinear P(k) on k in 10^[-3.5, 1] (box.py:770-782)."""
        k = np.logspace(-3.5, 1.0, int(1e3))
        pk = np.asarray(self.cosmology.pk_nl(k))
        return k, pk

    def sigmaR(self, R):
        """RMS of the realisation smoothed with a top-hat of R Mpc/h
        (box.py:657-683). Simpson-integrates the binned P(k)."""
        kc, pk, _ = self.binned_power_spectrum()
        kc = np.asarray(kc, dtype=np.float64)
        pk = np.asarray(pk, dtype=np.float64)
        good = ~np.isnan(pk)
        kc, pk = kc[good], pk[good]
        w = np.asarray(transforms.window(kc, R / self.cosmo.h))
        I = simpson(kc**2 * pk * w, x=kc)
        return np.sqrt(I / (2.0 * np.pi**2))

    def sigma8(self):
        """sigmaR at 8 Mpc/h (box.py:685-694)."""
        return self.sigmaR(8.0)

    # ------------------------------------------------------------------
    # Observational coordinates
    # ------------------------------------------------------------------
    def freq_array(self, redshift=None):
        """Descending frequency channels along z, MHz (box.py:789-828)."""
        return self.grid.freq_array(self.cosmology_at(redshift))

    def pixel_array(self, redshift=None):
        """Angular pixel coordinates in degrees (box.py:831-864)."""
        return self.grid.pixel_array(self.cosmology_at(redshift))

    # ------------------------------------------------------------------
    # Built-in consistency tests (box.py:871-948)
    # ------------------------------------------------------------------
    def test_parseval(self):
        """sum(delta_x^2) N^3 == sum |delta_k|^2 (box.py:931-948)."""
        s1 = float(jnp.sum(self.delta_x**2) * self.N**3)
        s2 = float(jnp.sum(self.delta_k * jnp.conj(self.delta_k)).real)
        print("Parseval test:", s1 / s2, "(should be 1.0)")
        return s1, s2

    def test_sampling_error(self):
        """sigma8 sampling-window report (box.py:871-928)."""
        cosmology = self.cosmology
        R8 = 8.0 / self.cosmo.h

        s8_real = self.sigma8()

        _k = np.linspace(self.kmin, self.kmax, int(5e3))
        _pk = np.asarray(cosmology.pk_nl(_k))
        _y = np.nan_to_num(_k**2 * _pk * np.asarray(transforms.window(_k, R8)))
        s8_th_win = np.sqrt(simpson(_y, x=_k) / (2.0 * np.pi**2))

        _k2 = np.logspace(-5, 2, int(5e4))
        _pk2 = np.asarray(cosmology.pk_nl(_k2))
        _y2 = np.nan_to_num(_k2**2 * _pk2 * np.asarray(transforms.window(_k2, R8)))
        s8_th_full = np.sqrt(simpson(_y2, x=_k2) / (2.0 * np.pi**2))

        dx = transforms.smooth_field(self.delta_k, self.grid, 8.0, self.cosmo.h)
        s8_realspace = float(jnp.std(dx.real))

        print("")
        print("sigma8 (real.): \t", s8_real)
        print("sigma8 (th.win.):\t", s8_th_win)
        print("sigma8 (th.full):\t", s8_th_full)
        print("sigma8 (realsp.):\t", s8_realspace)
        print("ratio =", s8_realspace / s8_real)
        return s8_real, s8_th_win, s8_th_full, s8_realspace
