"""The end-to-end 21cm mock pipeline as a single jitted function.

This is the TPU-native expression of the reference's
``examples/example_endtoend.py`` workload (SURVEY.md §3.2), the
"realize -> RSD -> filter -> P(k)" pipeline named in BASELINE.json:

  1. Gaussian density realisation with the tabulated nonlinear P(k)
  2. HI bias scaling and log-normal transform
  3. linear velocity field from the Gaussian delta_k
  4. redshift-space remap (vmapped per-LOS, sigma_nl dispersion)
  5. brightness-temperature scaling Tb (1 + delta_s)
  6. diffuse foreground cube (2D GRF amplitude x spectral-index power law)
  7. radiometer noise
  8. PCA foreground clean
  9. binned P(k) of the cleaned cube (and of intermediate fields)

Everything after the host-side setup (cosmology tables, instrument scalars)
is one XLA program: ``make_pipeline`` returns a jitted ``fn(key) -> dict``,
and ``make_ensemble_pipeline`` vmaps it over a batch of keys for Monte-Carlo
throughput, optionally sharded over a device mesh.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .cosmology import Cosmology
from .fields import gaussian, transforms
from .filters import pca_filter
from .grid import GridSpec
from .models import noise as noise_mod
from .models.foregrounds import ForegroundModel, gaussian_smooth_wrap
from .ops import fft_safe
from .ops import rsd as rsd_ops
from .ops import spectra as spectra_ops

__all__ = ["PipelineConfig", "make_pipeline", "make_chained_pipeline",
           "make_ensemble_pipeline"]


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static configuration of the end-to-end mock pipeline.

    Defaults mirror example_endtoend.py's parameter choices.
    """

    # Signal
    linear_pk: bool = False
    bias: float | None = None        # None -> HI bias fit at box redshift
    sigma_nl: float = 120.0          # km/s (example_endtoend.py:44)
    rsd_method: str = "linear"
    # Foregrounds (example_endtoend.py:59-68)
    fg_amp: float = 57.0
    fg_beta: float = 1.1
    fg_monopole: float = 10.0
    fg_smoothing_deg: float = 4.0
    spec_idx_mean: float = 2.07
    spec_idx_std: float = 2e-4
    spec_idx_smoothing_deg: float = 15.0
    freq_ref: float = 130.0
    # Noise (example_endtoend.py:82-84)
    Tinst: float = 18.0              # K
    tp_hours: float = 2.0
    fov_deg2: float = 1.0
    Ndish: int = 64
    # Instrument response (config 3: anisotropic filter + beam)
    beam_dish_m: float | None = None   # Gaussian beam FWHM = 1.22 lambda/D
    kpar_min: float | None = None      # foreground-avoidance high-pass (1/Mpc)
    # Cleaning + estimation
    pca_nmodes: int = 4
    pca_exact: bool = True    # exact eigh (default) vs subspace iteration
                              # (approximate when trailing modes are
                              # degenerate — opt in knowingly)
    nbins: int = 20
    include_foregrounds: bool = True
    include_noise: bool = True
    dtype: str = "float32"
    # Noise-draw scheme: 'half' (default) draws density noise directly on
    # the rfft half-spectrum — fastest, single-chip only.  'rows' draws
    # every noise field per leading-axis row (parallel/rng.py), giving
    # realisations that are IDENTICAL between the single-chip pipeline and
    # the sharded ensemble step (any mesh shape) for the same key.
    noise_scheme: str = "half"
    # Fuse the (delta_x, vel_z) inverse transforms into ONE complex MXU
    # inverse (ops/mmfft.irfftn_pair: irfft(a + i b) -> (Re, Im)) instead
    # of two native C2R dispatches.  Stays opt-in on BOTH axes: slower on
    # TPU in composition (50 vs 65 pipelines/s at 256^3, campaign log —
    # the full C2C costs more than the two half-spectrum C2Rs it fuses),
    # and truth-gate REJECTED at the bench size (fft_pair_high 6.4e-2 vs
    # the 1.29e-2 incumbent with a systematic +2% low-bin mean,
    # TRUTH_GATE_256.json).  f64 agrees with the default to 1e-9
    # (tested); useful off-TPU or at shapes where C2R dispatch dominates.
    fft_pair: bool = False
    # Matmul-DFT einsum precision for the three BIG 3D transforms only
    # (the delta_x / vel_z inverses and the cleaned-cube forward), which
    # touch signal-scale fields where the per-transform error is NOT
    # amplified.  None inherits the mmfft module default (HIGHEST).  The
    # small 2D foreground transforms always keep the module default: the
    # FG cube is 100-1000x brighter than the signal, so ITS HIGH-tier
    # error is signal-scale after PCA — the all-HIGH mode measured 2.1e-2
    # vs the f64 oracle where the incumbent sat at 6.4e-3
    # (TRUTH_GATE.json, 128^3).  At the bench size with
    # fg_spectral='poly' (TRUTH_GATE_256.json, round 4): HIGH 1.261e-3
    # vs HIGHEST 1.355e-3 — statistically identical, the residual is the
    # bf16 velocity inverse (see vel_precision), so the ~2x cheaper HIGH
    # is the default for the big transforms.
    mm3d_precision: str | None = "HIGH"
    # Separate einsum precision for the velocity-field inverse transform
    # ONLY (None inherits mm3d_precision).  The velocity cube enters the
    # pipeline solely as an RSD displacement (~a few cells), so a
    # per-transform rounding error epsilon perturbs voxel positions by
    # epsilon * |v|/H — second-order in the remapped density — unlike the
    # delta_x inverse, whose error is first-order in the field itself.
    # Round-5 truth gates (TRUTH_GATE_256_R5.json / TRUTH_GATE_512_R5.json,
    # same truth files as round 4): the bf16x3 "HIGH" tier closes the
    # shipping default's ENTIRE accuracy residual — 256^3 cleaned-P(k)
    # 8.04e-3 (DEFAULT) -> 3.28e-3 (HIGH) vs 3.76e-3 (HIGHEST,
    # statistically identical), and at 512^3 6.2e-4, BELOW the 2.03e-3
    # CPU-f32 floor — for a measured 3.1%% of throughput (104.2 -> 101.0
    # pipelines/s at 256^3, two runs each).  "HIGH" ships (the >=100/s
    # bar holds); "DEFAULT" (single-pass bf16) is the documented ~3%%
    # perf escape hatch; "HIGHEST" buys nothing over HIGH (round-4's
    # 92.7/s measurement made it an 8.2%% knob — superseded).
    vel_precision: str | None = "HIGH"
    # Separate einsum precisions for the OTHER two big transforms —
    # the delta_x inverse (``dx_precision``) and the cleaned-cube
    # forward (``fwd_precision``) — None inherits mm3d_precision.
    # Added in round 4 to gate the DEFAULT (single-pass bf16) tier per
    # transform now that the FG poly fix removed the former dominant
    # error: truth-gated AT 256^3 (TRUTH_GATE_256_R4B.json, see
    # scripts/truth_gate.py variants dx_default / fwd_default /
    # mm3d_default).
    dx_precision: str | None = None
    fwd_precision: str | None = None
    # Einsum precision for the PCA covariance/projection GEMMs
    # (filters/pca.py).  Round 3 fixed these at HIGHEST after DEFAULT
    # (single-pass bf16, ~2e-3/element) failed the gate at 4.2e-2 —
    # the cleaned low bins amplify PCA-side rounding ~1000x.  Round 4
    # gated the intermediate HIGH tier (bf16x3, ~2.4e-7/element):
    # 8.04e-3 vs the incumbent's 9.09e-3 under exact binning
    # (TRUTH_GATE_256_R4D.json) — statistically identical, and the
    # halved GEMM cost is worth ~3.6%% of the 256^3 pipeline (105.7
    # vs 102.0 pipelines/s with pallas_pk v2).  "HIGH" ships; None
    # inherits HIGHEST for maximum-caution standalone work.
    pca_precision: str | None = "HIGH"
    # Truth-anchoring knobs (scripts/truth_gate.py).  jax.random draws are
    # dtype-dependent (CLAUDE.md): the same key yields different values in
    # f32 vs f64, so an f64 run is normally a different REALISATION and can
    # only be compared statistically.  Setting ``draw_dtype='float32'`` on
    # an f64 pipeline makes every PRNG draw happen in f32 before casting to
    # the compute dtype, so the f64 run consumes the exact f32 random
    # stream and becomes a per-bin truth oracle for the f32 run.
    draw_dtype: str | None = None
    # The sigma_nl and radiometer-noise draws normally go through the fused
    # Pallas PRNG kernel on TPU (a different stream than threefry, so
    # per-bin cross-platform comparison is impossible).  ``threefry_noise``
    # forces those two draws onto platform-deterministic jax.random calls
    # inline in the pipeline — slower, gate-only.
    threefry_noise: bool = False
    # Binned-P(k) reduction backend for step (9): 'auto' uses the fused
    # Pallas kernel on TPU — the v2 variant (ops/pallas/binned_pk_v2.py,
    # hoisted exact integer-lattice counts, bit-identical sums) on
    # cubic-exact grids, v1 (ops/pallas/binned_pk.py) elsewhere — and
    # the XLA one-hot scan off-TPU; 'on' forces v1, 'v2' forces the
    # hoisted-counts kernel, 'v2t' additionally telescopes the digitize
    # (prefix differences; gated at exactly the incumbent class,
    # TRUTH_GATE_256_R4D.json, but kept opt-in pending a measured win),
    # 'off' forces the XLA path.  The Pallas slab accumulation is
    # ~1e3x more accurate in f32 (3.9e-7 vs 4.9e-4 max rel err at
    # 256^3, scripts/check_binned_pk_accuracy.py) and skips the
    # precomputed searchsorted pass by digitizing |k|^2 in-kernel.
    pallas_pk: str = "auto"
    # Density-draw backend for step (1): 'off' (default) keeps the
    # platform-deterministic threefry+erfinv half-spectrum draw;
    # 'auto'/'on' fuse the draw AND the sqrt(P) colour multiply into the
    # on-core Pallas PRNG kernel (ops/pallas/half_draw.py).  TPU-only
    # either way: pltpu.prng_* has no CPU interpreter.  Statistics are
    # exact (hardware-validated: scripts/tpu_kernel_checks.py, ensemble
    # gate scripts/check_pallas_draw_stats.py PASS) but the stream
    # differs from threefry, and IN COMPOSITION the kernel LOSES:
    # 256^3 bench 90.6 vs 93.3 pipelines/s (campaign round3a,
    # 2026-08-19) — the Hermitian-plane .at[].set fix-ups and the
    # kernel's fusion boundary (XLA can fuse erfinv+colour+velocity
    # weighting into one pass; a pallas_call cannot) cost more than the
    # 1.8 ms isolated draw saves.  Same composition-loss pattern as
    # FASTBOX_PALLAS_DFT (ops/mmfft.py).  Kept as an opt-in for larger
    # boxes/future backends.  Ignored when threefry_noise=True or
    # draw_dtype is set (the truth-gate configuration) or
    # noise_scheme='rows' (mesh-independent realisations need the
    # row-keyed threefry draw).
    pallas_draw: str = "off"
    # Foreground spectral-cube evaluation: 'poly' (default) splits
    # alpha = spec_idx_mean + dalpha and evaluates the pixel-varying
    # factor exp(dalpha*log(nu/ref)) by a cubic Taylor polynomial with
    # the pixel-common factors precomputed in f64 — see
    # ForegroundModel.construct_cube_smallalpha_fn for the truth-gate
    # finding that motivates it (the generic f32 pow's voxel-decorrelated
    # rounding is THE dominant cleaned-P(k) error at 256^3).  Falls back
    # to 'pow' automatically when the small-|dalpha*logf| bound does not
    # hold.  'pow' forces the reference-style generic power law.
    fg_spectral: str = "poly"
    # Diagnostic: also return the intermediate cubes (delta_x, vel_z,
    # delta_s, fg_cube, data, cleaned) so cross-platform per-stage
    # divergence can be measured (scripts/probe_stage_diff.py).  Gate /
    # probe use only — the extra outputs force materialisation and cost
    # ~30 s of tunnel download at 256^3.
    debug_stages: bool = False
    # Chained-pipeline eigh hoist: run the chain as
    # scan(realise..covariance) -> ONE batched eigh over the K stacked
    # covariances -> scan(project-clean..P(k)).  The same exact
    # estimator (jnp.linalg.eigh, merely batched: f64 chains agree to
    # 5e-13, tests/test_pipeline_hoist.py) and gate-admitted at 256^3
    # (TRUTH_GATE_256_R4C.json: 9.8e-3 vs the 9.1e-3 incumbent class)
    # — but a measured composition LOSER on this backend (round-4c
    # A/B): 100.2 vs 102.0 pipelines/s at 256^3, 9.25 vs 9.72 at 512^3.
    # The batched QDWH eigh does not amortise K small decompositions
    # enough to beat the structure tax (K extra cube materialisations:
    # data + |delta_k|^2 stacks, plus the severed producer fusions at
    # the scan boundary — the same ~1%%-per-boundary pattern as the
    # Pallas draw kernels, docs/tpu_timings.md).  Default 'off'; 'on'
    # forces it (useful off-TPU or at future chain lengths), 'auto'
    # currently resolves to 'off' everywhere.
    eigh_hoist: str = "off"
    # Bits->normal transform for the threefry density half-spectrum draw
    # (step 1, 'half' scheme only): 'erfinv' (jax.random.normal, the
    # stream every committed oracle expectation uses) or 'box_muller'
    # (one log+sqrt+cos+sin pair per COMPLEX mode instead of two erf_inv
    # polynomial evaluations — a pure-XLA lightening that still fuses
    # with the colour multiply, unlike pallas_draw).  A different,
    # equally valid realisation stream; composes with draw_dtype (the
    # uniforms are drawn in draw_dtype), so the truth gate can oracle it
    # per-bin.  Candidate flip after TPU measurement + 256^3 gate.
    draw_method: str = "erfinv"
    # Additive per-bin debias vector subtracted from the RETAINED
    # pk_cleaned bins (length nbins-1, same order as the returned "k").
    # Round-5 experiment (VERDICT #7): the bf16 DEFAULT DFT tiers are
    # ~10%% faster but their rounding is ADDITIVE noise power — a
    # systematic +2-4e-3 signed bias on the cleaned low bins
    # (TRUTH_GATE_256_R4B.json).  Additive power is calibratable:
    # ``calibrate_pk_debias`` measures mean(pk_fast - pk_ref) on
    # held-out keys and this knob subtracts it in the estimator.
    # None = no subtraction (default).  See scripts/debias_pk.py for
    # the truth-gate verdict on whether the debiased DEFAULT tier is
    # admissible.
    pk_debias: tuple | None = None

    def __post_init__(self):
        # Validate knobs that are otherwise consumed far from construction,
        # so invalid values fail fast for every pipeline constructor.
        # NOTE: eigh_hoist only has an effect in make_chained_pipeline —
        # make_pipeline/make_ensemble_pipeline have no chain to hoist over
        # ('on' is accepted there but is a no-op by construction).
        if self.eigh_hoist not in ("auto", "on", "off"):
            raise ValueError(f"Unknown eigh_hoist '{self.eigh_hoist}'")
        if self.pallas_pk not in ("auto", "on", "off", "v2", "v2t"):
            raise ValueError(f"Unknown pallas_pk '{self.pallas_pk}'")
        if self.fg_spectral not in ("poly", "pow"):
            raise ValueError(f"Unknown fg_spectral '{self.fg_spectral}'")


def _hi_bias(z):
    """Bull et al. (2015) b_HI(z) fit (reference tracers.py:129-144)."""
    return 6.6655e-01 + 1.7765e-01 * z + 5.0223e-02 * z**2


def _hi_tb(z):
    """Tb(z) power-law fit in mK (reference tracers.py:115-117)."""
    return 5.5919e-02 + 2.3242e-01 * z - 2.4136e-02 * z**2


def _build_pipeline(grid: GridSpec, cosmology: Cosmology,
                    config: PipelineConfig):
    """Construct the pipeline body: ``(fn_inner, (amp_half, bin_idx))``.

    ``fn_inner(key, amp_half, bin_idx) -> dict`` is the pure body; the
    two device consts are returned separately so callers pass them as
    ARGUMENTS to their jit (closed-over cubes are shipped to the remote
    compiler as constants and blow up at 512^3+, CLAUDE.md).
    """
    dtype = jnp.dtype(config.dtype)
    z = grid.redshift
    bias = float(config.bias if config.bias is not None else _hi_bias(z))
    Tb = float(_hi_tb(z))
    Hz = 100.0 * cosmology.h * cosmology.Ea

    # Host-side instrument constants
    freqs = grid.freq_array(cosmology)
    ang_x, _ = grid.pixel_array(cosmology)
    dang = ang_x[1] - ang_x[0]
    fg_sigma_pix = config.fg_smoothing_deg / dang
    alpha_sigma_pix = config.spec_idx_smoothing_deg / dang
    sigma_rms = noise_mod.radiometer_sigma(
        freqs, ang_x, config.Tinst, config.tp_hours, config.fov_deg2,
        config.Ndish,
    )
    freqs_j = jnp.asarray(freqs.copy(), dtype=dtype)
    sigma_j = jnp.asarray(sigma_rms, dtype=dtype)

    # Foreground spectral factors, precomputed in f64 on host (see
    # PipelineConfig.fg_spectral / construct_cube_smallalpha_fn).  The
    # poly path needs |dalpha * logf| << 1; with dalpha ~ N(0, std^2)
    # smoothed, an 8-sigma bound at 0.01 keeps the cubic's truncation
    # error below 4e-10 with astronomically safe margin.
    if config.fg_spectral not in ("poly", "pow"):
        raise ValueError(f"Unknown fg_spectral '{config.fg_spectral}'")
    _logf = np.log(np.asarray(freqs, np.float64) / config.freq_ref)
    use_fg_poly = (config.fg_spectral == "poly"
                   and 8.0 * config.spec_idx_std * np.abs(_logf).max() < 1e-2)
    ffac_mean_j = jnp.asarray(
        np.power(np.asarray(freqs, np.float64) / config.freq_ref,
                 config.spec_idx_mean), dtype)
    logf_j = jnp.asarray(_logf, dtype)

    pk_fn = cosmology.pk_lin if config.linear_pk else cosmology.pk_nl

    # The pipeline works on the rfft half-spectrum (the field is real):
    # half the FFT cost and half the reduction traffic, exactly equivalent
    # to the full grid.  Large per-grid arrays (the sqrt(P) amplitude) are
    # passed as *arguments* to the jitted function rather than closed-over
    # constants — embedded constants are shipped with the program to the
    # compiler and blow up at 512^3+.
    H = grid.N // 2 + 1
    vel_fac = float(100.0 * cosmology.h * cosmology.Ea
                    * cosmology.growth_rate * cosmology.scale_factor)

    kxv, kyv, kzv = grid.kvec(dtype)
    kz_half = kzv[:H]
    nyq_z = grid.nyquist_mask(2)[:H]

    # sqrt(P(k) boxfactor) on the half grid, tabulated once at build time
    # (the table interpolation over N^3/2 values costs ~150 ms on TPU).
    kmag_half_build = jnp.sqrt(kxv[:, None, None] ** 2 + kyv[None, :, None] ** 2
                               + kz_half[None, None, :] ** 2)
    amp_half = jnp.sqrt(jnp.nan_to_num(pk_fn(kmag_half_build))
                        * jnp.asarray(grid.boxfactor, dtype)).astype(dtype)
    del kmag_half_build

    # Half-spectrum mode multiplicity along kz
    kz_weight = np.full(H, 2.0, dtype=np.float64)
    kz_weight[0] = 1.0
    if grid.N % 2 == 0:
        kz_weight[-1] = 1.0
    kzw_j = jnp.asarray(kz_weight, dtype)

    kbins_edges = np.asarray(spectra_ops.default_kbins(grid, config.nbins))
    _e = np.concatenate([[0.0], kbins_edges])
    kcent = 0.5 * (_e[1:] + _e[:-1])
    nb = kbins_edges.size
    if config.pk_debias is not None and len(config.pk_debias) != nb - 1:
        raise ValueError(
            f"pk_debias must have length {nb - 1} (the retained bins); "
            f"got {len(config.pk_debias)}")
    # Bin classification plan (round 4): squared-space digitize, with
    # EXACT integer-lattice operands on cubic grids — identical bin
    # membership in every dtype/platform/kernel (the floating |k| path
    # put 5 edge-sitting fundamental modes in different bins between
    # f32 and f64, a ~3e-1 artifact in the first retained 512^3 bin;
    # see ops/spectra.kbin_thresholds).
    _thr = spectra_ops.kbin_thresholds(grid, kbins_edges)
    if _thr is not None:
        _fi2 = spectra_ops._index_sq(grid)          # int32 (N,), exact
        kx2_b = jnp.asarray(_fi2, dtype)            # integer-valued f32
        ky2_b = kx2_b
        kz2_b = jnp.asarray(_fi2[:H], dtype)
        edges2_j = jnp.asarray(_thr.astype(np.float64) - 0.5, dtype)
    else:
        kx2_b, ky2_b, kz2_b = None, None, None      # built from kvec below
        edges2_j = jnp.asarray(kbins_edges.astype(np.float64) ** 2, dtype)

    if config.pallas_pk not in ("auto", "on", "off", "v2", "v2t"):
        raise ValueError(f"Unknown pallas_pk '{config.pallas_pk}'")
    use_pallas_pk = (config.pallas_pk in ("on", "v2", "v2t")
                     or (config.pallas_pk == "auto"
                         and jax.default_backend() == "tpu"))
    # v2 kernel (ops/pallas/binned_pk_v2.py): drops the in-kernel count
    # pass — the weighted bin populations are pure geometry, precomputed
    # EXACTLY below on the integer lattice.  Cubic-exact grids only
    # (falls back to v1 elsewhere); 'v2t' additionally telescopes the
    # digitize (prefix differences — a different summation order, gate
    # before shipping).
    use_pk_v2 = (config.pallas_pk in ("v2", "v2t")
                 or (config.pallas_pk == "auto"
                     and jax.default_backend() == "tpu")) \
        and _thr is not None
    if config.pallas_pk in ("v2", "v2t") and _thr is None:
        # An explicitly forced v2/v2t request cannot be honored off
        # cubic-exact grids (the hoisted counts are exact integer-lattice
        # geometry) — warn instead of silently measuring the v1 kernel.
        import warnings

        warnings.warn(
            f"pallas_pk='{config.pallas_pk}' requires a cubic-exact grid "
            "(kbin_thresholds returned None); falling back to the v1 "
            "kernel" + (" and dropping telescoping"
                        if config.pallas_pk == "v2t" else ""),
            stacklevel=2)
    cnt_v2_j = None
    if use_pallas_pk and use_pk_v2:
        _w_plane = np.broadcast_to(kz_weight[None, :],
                                   (grid.N, H)).ravel()
        _cnt = np.zeros(nb + 1, np.float64)
        for _i in range(grid.N):
            _m = (int(_fi2[_i]) + _fi2[:, None].astype(np.int64)
                  + _fi2[:H][None, :].astype(np.int64))
            _idx = np.searchsorted(_thr, _m.ravel(), side="right")
            _cnt += np.bincount(_idx, weights=_w_plane,
                                minlength=nb + 1)[:nb + 1]
        cnt_v2_j = jnp.asarray(_cnt[:nb], dtype)
    _pk_interpret = jax.default_backend() != "tpu"  # CPU: Pallas interpreter

    if use_pallas_pk:
        # The Pallas kernel digitizes k^2 in-kernel; no index cube needed.
        bin_idx_arg = jnp.zeros((1,), jnp.int32)
        if kx2_b is None:
            kx2_b = kxv * kxv
            ky2_b = kyv * kyv
            kz2_b = kz_half * kz_half
    else:
        # Bin indices precomputed once on device, passed as a runtime
        # argument (recomputing the searchsorted per call costs ~7 ms at
        # 256^3).  Cubic grids classify the exact integer lattice.
        if _thr is not None:
            _fi2_j = jnp.asarray(_fi2)
            _m = (_fi2_j[:, None, None] + _fi2_j[None, :, None]
                  + _fi2_j[:H][None, None, :])
            bin_idx_arg = jnp.searchsorted(jnp.asarray(_thr), _m.ravel(),
                                           side="right").astype(jnp.int32)
            del _m
        else:
            _kmag_b = jnp.sqrt(kxv[:, None, None] ** 2
                               + kyv[None, :, None] ** 2
                               + kz_half[None, None, :] ** 2)
            bin_idx_arg = jnp.searchsorted(jnp.asarray(kbins_edges, dtype),
                                           _kmag_b.ravel(),
                                           side="right").astype(jnp.int32)
            del _kmag_b

    if config.noise_scheme not in ("half", "rows"):
        raise ValueError(f"Unknown noise_scheme '{config.noise_scheme}'")
    rows_mode = config.noise_scheme == "rows"

    if config.pallas_draw not in ("auto", "on", "off", "vz"):
        raise ValueError(f"Unknown pallas_draw '{config.pallas_draw}'")
    # TPU-only in every mode: pltpu.prng_* has no CPU interpreter support
    # (tests/test_pallas_noise.py), so off-TPU the threefry path always
    # runs regardless of the knob.
    _pallas_draw_ok = (
        not rows_mode and not config.threefry_noise
        and config.draw_dtype is None
        and jax.default_backend() == "tpu"
        and grid.N % 8 == 0 and (grid.N * H) % 128 == 0)
    use_pallas_draw = _pallas_draw_ok and config.pallas_draw in ("auto", "on")
    # 'vz' additionally fuses the velocity k-weighting into the draw
    # kernel (round-4 fusion experiment, VERDICT #7): vz_k is emitted by
    # the same VMEM pass, and its kz=0/Nyquist planes carry zero weight
    # so only delta needs the Hermitian fix-up.
    use_pallas_vz = _pallas_draw_ok and config.pallas_draw == "vz"
    if use_pallas_vz:
        _kyz2 = (np.asarray(kyv, np.float64)[:, None] ** 2
                 + np.asarray(kz_half, np.float64)[None, :] ** 2)
        kyz2row_j = jnp.asarray(_kyz2.reshape(1, grid.N * H), dtype)
        _kznum = np.where(np.asarray(nyq_z), 0.0,
                          vel_fac * np.asarray(kz_half, np.float64))
        kznumrow_j = jnp.asarray(
            np.broadcast_to(_kznum[None, :], (grid.N, H))
            .reshape(1, grid.N * H), dtype)
        kx2col_j = jnp.asarray(
            np.asarray(kxv, np.float64).reshape(grid.N, 1) ** 2, dtype)

    ddt = jnp.dtype(config.draw_dtype) if config.draw_dtype else dtype
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    _pca_prec = (jax.lax.Precision.HIGHEST if config.pca_precision is None
                 else getattr(jax.lax.Precision, config.pca_precision))

    def fn_pre(key, amp_half, want_cov=False):
        """Stages (1)-(7b): realise through the instrument response.

        Returns a dict with the data cube, the density power half-cube
        and summary scalars; with ``want_cov`` also the frequency-
        frequency covariance (the eigh-hoist path computes the batched
        eigendecomposition OUTSIDE the chain scan — see
        PipelineConfig.eigh_hoist).
        """
        from .parallel.rng import (TAGS, default_row_method,
                                   row_complex_normal, row_normal)
        _rm = default_row_method(grid.N)

        (k_dens, k_rsd, k_fg, k_alpha, k_noise) = jax.random.split(key, 5)

        # (1) Gaussian density field (conventions of box.py:130-194): noise
        # drawn directly on the Hermitian half-spectrum (statistics identical
        # to the reference's full draw + .real projection), or per-row in
        # x-space (mesh-independent 'rows' scheme; costs one extra rfftn).
        if rows_mode:
            white = row_normal(key, TAGS["density"], 0, grid.N,
                               (grid.N, grid.N), dtype, _rm)
            white_h = fft_safe.rfftn(
                white, precision=config.mm3d_precision
            ) * dtype.type(grid.N ** -1.5)
            delta_k = white_h * amp_half
        elif use_pallas_vz:
            # Fused draw + colour + velocity weighting in ONE VMEM pass
            # (round-4 fusion experiment — see PipelineConfig.pallas_draw)
            delta_k, vz_k = gaussian.colored_half_noise_vz(
                k_dens, grid, amp_half, kx2col_j, kyz2row_j, kznumrow_j,
                dtype)
        elif use_pallas_draw:
            # Fused draw + colour multiply in VMEM (different stream than
            # threefry — see PipelineConfig.pallas_draw)
            delta_k = gaussian.colored_half_noise(
                k_dens, grid, amp_half, dtype)
        else:
            white_h = gaussian.hermitian_half_noise(
                k_dens, grid, ddt, method=config.draw_method)
            if ddt != dtype:
                white_h = white_h.astype(cdtype)
            delta_k = white_h * amp_half

        # (3, hoisted) LOS velocity spectrum from the Gaussian field
        # (z component only); k-weights built on the fly (XLA fuses the
        # broadcasts).  The 'vz' draw mode emitted vz_k already.
        if not use_pallas_vz:
            k2 = (kxv[:, None, None] ** 2 + kyv[None, :, None] ** 2
                  + kz_half[None, None, :] ** 2)
            inv_k2 = jnp.where(k2 > 0.0,
                               1.0 / jnp.where(k2 > 0.0, k2, 1.0), 0.0)
            vz_k = (1j * delta_k) * (dtype.type(vel_fac)
                                     * kz_half[None, None, :] * inv_k2)
            vz_k = jnp.where(nyq_z[None, None, :], 0.0, vz_k)

        if config.fft_pair:
            from .ops import mmfft

            delta_x, vel_z = mmfft.irfftn_pair(
                delta_k, vz_k, s=grid.shape,
                precision=config.mm3d_precision)
            delta_x = delta_x.astype(dtype)
            vel_z = vel_z.astype(dtype)
        else:
            delta_x = fft_safe.irfftn(
                delta_k, s=grid.shape,
                precision=(config.dx_precision
                           if config.dx_precision is not None
                           else config.mm3d_precision)).astype(dtype)
            vel_z = fft_safe.irfftn(
                vz_k, s=grid.shape,
                precision=(config.vel_precision
                           if config.vel_precision is not None
                           else config.mm3d_precision)).astype(dtype)

        # (2) bias + log-normal
        delta_ln = transforms.lognormal(delta_x * bias)

        # (4) RSD remap
        if rows_mode and config.sigma_nl > 0.0:
            vel_z = vel_z + dtype.type(config.sigma_nl) * row_normal(
                key, TAGS["sigma_nl"], 0, grid.N, (grid.N, grid.N),
                dtype, _rm)
            delta_s = rsd_ops.redshift_space_density(
                delta_ln, vel_z, grid, Hz, sigma_nl=0.0,
                method=config.rsd_method,
            )
        elif config.threefry_noise and config.sigma_nl > 0.0:
            # Gate path: platform-deterministic threefry draw in ddt,
            # mirroring add_scaled_normal's fallback stream shape
            vel_z = vel_z + dtype.type(config.sigma_nl) * jax.random.normal(
                k_rsd, grid.shape, ddt).astype(dtype)
            delta_s = rsd_ops.redshift_space_density(
                delta_ln, vel_z, grid, Hz, sigma_nl=0.0,
                method=config.rsd_method,
            )
        else:
            delta_s = rsd_ops.redshift_space_density(
                delta_ln, vel_z, grid, Hz, sigma_nl=config.sigma_nl,
                key=k_rsd, method=config.rsd_method,
            )

        # (5) signal cube in mK
        data = Tb * (1.0 + delta_s)

        # (6) foregrounds
        if config.include_foregrounds:
            if rows_mode:
                white2d = row_complex_normal(
                    key, TAGS["fg_re"], TAGS["fg_im"], 0, grid.N,
                    (grid.N,), dtype, _rm)
                alpha_w = row_normal(key, TAGS["alpha"], 0, grid.N,
                                     (grid.N,), dtype, _rm)
            else:
                kf1, kf2 = jax.random.split(k_fg)
                white2d = (
                    jax.random.normal(kf1, (grid.N, grid.N), ddt).astype(dtype)
                    + 1j * jax.random.normal(kf2, (grid.N, grid.N),
                                             ddt).astype(dtype))
                alpha_w = jax.random.normal(
                    k_alpha, (grid.N, grid.N), ddt).astype(dtype)
            fg_map = ForegroundModel.foreground_amp_from_whitenoise(
                white2d, grid, cosmology.chi, config.fg_amp, config.fg_beta,
                config.fg_monopole, fg_sigma_pix,
            )
            if use_fg_poly:
                # Smooth only the tiny pixel-varying part (linear op:
                # algebraically identical to smoothing mean + std*w) and
                # keep every large spectral factor pixel-common.
                dalpha = config.spec_idx_std * gaussian_smooth_wrap(
                    alpha_w, alpha_sigma_pix)
                alpha_map = config.spec_idx_mean + dalpha
                fg_cube = ForegroundModel.construct_cube_smallalpha_fn(
                    fg_map, dalpha, ffac_mean_j, logf_j)
            else:
                alpha_map = (config.spec_idx_mean
                             + config.spec_idx_std * alpha_w)
                alpha_map = gaussian_smooth_wrap(alpha_map, alpha_sigma_pix)
                fg_cube = ForegroundModel.construct_cube_fn(
                    fg_map, alpha_map, freqs_j, config.freq_ref
                )
            data = data + fg_cube

        # (7) radiometer noise (fused PRNG kernel on TPU)
        if config.include_noise:
            if rows_mode:
                data = data + row_normal(key, TAGS["noise"], 0, grid.N,
                                         (grid.N, grid.N), dtype, _rm) \
                    * sigma_j[None, None, :]
            elif config.threefry_noise:
                data = data + jax.random.normal(
                    k_noise, grid.shape, ddt).astype(dtype) \
                    * sigma_j[None, None, :]
            else:
                data = rsd_ops.add_scaled_normal(data, sigma_j, k_noise)

        # (7b) instrument response (config 3): per-channel Gaussian beam in
        # k_perp, and a k_par foreground-avoidance high-pass
        if config.beam_dish_m is not None:
            from .constants import C_MS

            lam = C_MS / (freqs * 1e6)
            fwhm = 1.22 * lam / config.beam_dish_m           # rad
            sigma_r = (fwhm / np.sqrt(8.0 * np.log(2.0))) * cosmology.chi
            sig_j = jnp.asarray(sigma_r, dtype)              # (Nfreq,) Mpc
            kperp2 = (kxv[:, None] ** 2
                      + kyv[: grid.N // 2 + 1][None, :] ** 2)
            dk2 = fft_safe.rfftn(data, axes=(0, 1))
            B = jnp.exp(-0.5 * kperp2[:, :, None] * (sig_j**2)[None, None, :])
            data = fft_safe.irfftn(dk2 * B, s=(grid.N, grid.N),
                                   axes=(0, 1)).astype(dtype)
        if config.kpar_min is not None:
            dkz = fft_safe.rfft(data, axis=2)
            T = 1.0 - jnp.exp(-0.5 * (kz_half / dtype.type(config.kpar_min)) ** 2)
            data = fft_safe.irfft(dkz * T[None, None, :], n=grid.N,
                                  axis=2).astype(dtype)

        boxf = jnp.asarray(grid.boxfactor, dtype)
        pre = {
            "data": data,
            "p_dens": (delta_k * jnp.conj(delta_k)).real / boxf,
            "sigma_data": jnp.std(data),
        }
        if want_cov:
            # np.cov with ddof=1 — exactly pca_filter's covariance
            # (filters/pca.py, same pca_precision resolution): the
            # hoisted path must feed the batched eigh the same matrix
            # the in-line path builds.
            d2 = data.reshape((-1, data.shape[-1])).T
            x = d2 - jnp.mean(d2, axis=-1, keepdims=True)
            pre["cov"] = jnp.matmul(x, x.T, precision=_pca_prec) \
                / (d2.shape[1] - 1)
        if config.debug_stages:
            pre.update(delta_x=delta_x, vel_z=vel_z, delta_s=delta_s)
            if config.include_foregrounds:
                pre.update(fg_cube=fg_cube, fg_map=fg_map,
                           alpha_map=alpha_map)
        return pre

    def fn_post(pre, U, bin_idx):
        """Stages (8)-(9): PCA clean and binned spectra.

        ``U = None`` computes the eigendecomposition inline (the plain
        single-shot path, via filters.pca); a precomputed ``U`` (the
        top-modes eigenvector block from the hoisted batched eigh)
        applies the identical projection clean without it.
        """
        data = pre["data"]

        # (8) PCA clean: exact eigh by default; block-power subspace
        # iteration is the opt-in perf knob (pca_exact=False — approximate
        # when trailing modes are degenerate, see PipelineConfig)
        if U is not None:
            # Projection clean with the hoisted eigenvectors — the same
            # arithmetic (and GEMM precision) as filters.pca.pca_filter.
            prec = _pca_prec
            shape = data.shape
            d2 = data.reshape((-1, shape[-1])).T
            d_mean = jnp.mean(d2, axis=-1, keepdims=True)
            x = d2 - d_mean
            fg_amps = jnp.matmul(U.T, x, precision=prec)
            fg_field = (jnp.matmul(U, fg_amps, precision=prec)
                        + d_mean).T.reshape(shape)
            cleaned = data - fg_field
        elif config.pca_exact:
            cleaned = pca_filter(data, config.pca_nmodes,
                                 precision=config.pca_precision)
        else:
            from .filters.pca import pca_filter_subspace

            cleaned = pca_filter_subspace(data, config.pca_nmodes)

        # (9) binned P(k) of the cleaned cube and the underlying density
        # (half-spectrum reductions, multiplicity-weighted: exactly the
        # full-grid convention of box.py:696-768; both cubes share one
        # histogram pass)
        boxf = jnp.asarray(grid.boxfactor, dtype)
        ck = fft_safe.rfftn(cleaned,
                            precision=(config.fwd_precision
                                       if config.fwd_precision is not None
                                       else config.mm3d_precision))
        p_clean = (ck * jnp.conj(ck)).real / boxf
        p_dens = pre["p_dens"]
        if use_pallas_pk and use_pk_v2:
            from .ops.pallas.binned_pk_v2 import binned_pk_half_dual_pallas_v2

            s1, q1, s2 = binned_pk_half_dual_pallas_v2(
                p_clean, p_dens, kx2_b, ky2_b, kz2_b, kzw_j, edges2_j,
                telescoped=config.pallas_pk == "v2t",
                interpret=_pk_interpret)
            cnt = cnt_v2_j
        elif use_pallas_pk:
            from .ops.pallas.binned_pk import binned_pk_half_dual_pallas

            s1, q1, s2, cnt = binned_pk_half_dual_pallas(
                p_clean, p_dens, kx2_b, ky2_b, kz2_b, kzw_j, edges2_j,
                interpret=_pk_interpret)
        else:
            from .ops.reduce import binned_weighted_dual

            w = jnp.broadcast_to(kzw_j[None, None, :], p_clean.shape)
            s1, q1, s2, _, cnt = binned_weighted_dual(
                p_clean.ravel(), p_dens.ravel(), w.ravel(), bin_idx, nb)
        pk_clean = (s1 / cnt)[1:]
        if config.pk_debias is not None:
            pk_clean = pk_clean - jnp.asarray(config.pk_debias, dtype)
        var = jnp.maximum(q1 / cnt - (s1 / cnt) ** 2, 0.0)
        var = jnp.where(cnt > 1, var, 0.0)
        pk_err = (jnp.sqrt(var) / jnp.sqrt(cnt))[1:]
        pk_dens = (s2 / cnt)[1:]

        out = {
            "k": jnp.asarray(kcent[1:], dtype),
            "pk_cleaned": pk_clean,
            "pk_cleaned_err": pk_err,
            "pk_density": pk_dens,
            "sigma_data": pre["sigma_data"],
        }
        if config.debug_stages:
            out.update(
                {n: pre[n] for n in ("delta_x", "vel_z", "delta_s")},
                data=data, cleaned=cleaned,
                ck_power=p_clean,
            )
            if config.include_foregrounds:
                out["fg_cube"] = pre["fg_cube"]
                out["fg_map"] = pre["fg_map"]
                out["alpha_map"] = pre["alpha_map"]
        return out

    def fn_inner(key, amp_half, bin_idx):
        return fn_post(fn_pre(key, amp_half), None, bin_idx)

    fn_inner.pre = fn_pre
    fn_inner.post = fn_post
    return fn_inner, (amp_half, bin_idx_arg)


def make_pipeline(grid: GridSpec, cosmology: Cosmology,
                  config: PipelineConfig = PipelineConfig(), jit: bool = True):
    """Build the end-to-end mock pipeline as a pure function of a PRNG key.

    Returns ``fn(key) -> dict`` with the cleaned data cube's binned P(k)
    (k centroids are static and returned alongside), plus summary fields.
    """
    fn_inner, consts = _build_pipeline(grid, cosmology, config)
    if jit:
        inner = jax.jit(fn_inner)
        return lambda key: inner(key, *consts)
    return lambda key: fn_inner(key, *consts)


def make_chained_pipeline(grid: GridSpec, cosmology: Cosmology,
                          config: PipelineConfig = PipelineConfig()):
    """``fn(keys[K]) -> dict`` running K pipelines SEQUENTIALLY in one
    program via ``lax.scan`` (outputs stacked on a leading axis).

    One dispatch per K realisations: through the remote-execution tunnel
    each program launch costs ~5 ms (measured 2026-08-17 at 256^3, ~25%%
    of the pipeline), which this amortises.  Unlike ``vmap`` ensembles
    the body keeps unbatched cube shapes, so the Pallas kernels and the
    probed native FFTs lower exactly as in the single-shot pipeline.
    """
    fn_inner, consts = _build_pipeline(grid, cosmology, config)

    if config.eigh_hoist not in ("auto", "on", "off"):
        raise ValueError(f"Unknown eigh_hoist '{config.eigh_hoist}'")
    # 'auto' resolves to OFF: the hoist measured a composition loss on
    # TPU in the round-4c A/B (see PipelineConfig.eigh_hoist).
    use_hoist = (config.pca_exact and not config.debug_stages
                 and config.eigh_hoist == "on")

    if use_hoist:
        # Two scans around ONE batched eigh (PipelineConfig.eigh_hoist):
        # the per-realisation (Nfreq, Nfreq) eigh is latency-bound inside
        # the scan body (the MXU idles while it iterates on a tiny
        # matrix); hoisting turns K sequential eighs into one batched
        # decomposition.  Same estimator, same HIGHEST GEMMs — phase B
        # applies the identical projection clean.
        nmodes = config.pca_nmodes

        @jax.jit
        def chained(keys, amp_half, bin_idx):
            def body_a(carry, key):
                return carry, fn_inner.pre(key, amp_half, want_cov=True)

            _, pre = jax.lax.scan(body_a, None, keys)
            cov = pre.pop("cov")
            _, vecs = jnp.linalg.eigh(cov)          # (K, C, C), ascending
            pre["U"] = vecs[:, :, ::-1][:, :, :nmodes]

            def body_b(carry, xs):
                U = xs["U"]
                rest = {k: v for k, v in xs.items() if k != "U"}
                return carry, fn_inner.post(rest, U, bin_idx)

            _, outs = jax.lax.scan(body_b, None, pre)
            return outs

        return lambda keys: chained(keys, *consts)

    @jax.jit
    def chained(keys, amp_half, bin_idx):
        def body(carry, key):
            return carry, fn_inner(key, amp_half, bin_idx)

        _, outs = jax.lax.scan(body, None, keys)
        return outs

    return lambda keys: chained(keys, *consts)


def calibrate_pk_debias(grid: GridSpec, cosmology: Cosmology,
                        config_fast: PipelineConfig,
                        config_ref: PipelineConfig | None = None,
                        keys=(5000, 5001, 5002, 5003, 5004, 5005, 5006, 5007)):
    """Measure the additive per-bin bias of a fast (lower-precision)
    pipeline configuration against a reference configuration.

    Runs both configurations on the same held-out ``keys`` (use keys
    DISJOINT from any science/gate keys) and returns
    ``mean(pk_fast - pk_ref, axis=keys)`` as a tuple suitable for
    ``dataclasses.replace(config_fast, pk_debias=...)``.

    Motivation (TRUTH_GATE_256_R4B.json): bf16 DEFAULT-tier DFT rounding
    is additive noise power — a systematic positive bias on the cleaned
    low bins — which is the one error class an estimator can subtract
    after calibration.  ``config_ref`` defaults to ``config_fast`` with
    the precision knobs restored to the shipping tiers.
    """
    import dataclasses as _dc

    if config_ref is None:
        config_ref = _dc.replace(config_fast, mm3d_precision="HIGH",
                                 dx_precision=None, fwd_precision=None,
                                 pk_debias=None)
    config_fast = _dc.replace(config_fast, pk_debias=None)
    fn_fast = make_pipeline(grid, cosmology, config_fast)
    fn_ref = make_pipeline(grid, cosmology, config_ref)
    diffs = []
    for seed in keys:
        k = jax.random.PRNGKey(seed)
        pf = np.asarray(fn_fast(k)["pk_cleaned"], np.float64)
        pr = np.asarray(fn_ref(k)["pk_cleaned"], np.float64)
        diffs.append(pf - pr)
    return tuple(float(v) for v in np.mean(diffs, axis=0))


def make_ensemble_pipeline(grid: GridSpec, cosmology: Cosmology,
                           config: PipelineConfig = PipelineConfig(),
                           mesh=None, axis: str = "ens"):
    """Vmapped Monte-Carlo ensemble: ``fn(keys[B]) -> dict`` of stacked outputs.

    With ``mesh`` given, the key batch (and all derived cubes) is sharded
    over ``axis`` — pure data parallelism over realisations, the BASELINE
    throughput configuration.
    """
    single = make_pipeline(grid, cosmology, config, jit=False)

    def batched(keys):
        # Under vmap the cube FFTs acquire a batch dim, which the native
        # TPU FFT cannot run at all — force the matmul path at trace time.
        with fft_safe.matmul_only():
            return jax.vmap(single)(keys)

    if mesh is None:
        return jax.jit(batched)

    from jax.sharding import NamedSharding, PartitionSpec as P

    keys_sharding = NamedSharding(mesh, P(axis))
    return jax.jit(batched, in_shardings=(keys_sharding,))
