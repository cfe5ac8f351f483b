"""Poisson halo sampling (L4).

Reference: ``fastbox/halos.py``.  The count-field realisation
(halos.py:53-117) is fully on-device (Poisson draws are a native
``jax.random`` primitive).  Catalogue extraction (halos.py:120-176) is
shape-dynamic in the reference (ragged repeat/concatenate); here it is
realised either on the host (exact reference semantics) or on device into a
fixed-size padded buffer (``realise_halo_catalogue_padded``) so it can live
inside jit — the SURVEY.md §7 "hard parts" strategy.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "halo_count_field",
    "halo_catalogue_host",
    "realise_halo_catalogue_padded",
    "HaloDistribution",
]


@partial(jax.jit, static_argnames=("grid", "lognormal"))
def halo_count_field(key, delta_x, grid, nbar, bias, lognormal: bool = False):
    """Poisson halo counts per voxel (halos.py:53-117).

    N_halo(x) ~ Poisson[ V_vox * nbar * (1 + bias * delta_x) ], with the
    negative-mean clip applied only in the non-lognormal branch
    (halos.py:112-113) and nan_to_num inside the rate (halos.py:116).
    """
    nbar = jnp.atleast_1d(jnp.asarray(nbar, dtype=delta_x.dtype))
    bias = jnp.atleast_1d(jnp.asarray(bias, dtype=delta_x.dtype))
    if nbar.ndim == 1:
        nbar = nbar[None, None, :]
    if bias.ndim == 1:
        bias = bias[None, None, :]

    voxel_vol = grid.voxel_volume

    delta_h = bias * delta_x
    if lognormal:
        d = jnp.exp(delta_h)
        delta_h = d / jnp.mean(d) - 1.0

    Nbar = voxel_vol * nbar * (1.0 + delta_h)
    if not lognormal:
        Nbar = jnp.maximum(Nbar, 0.0)
    return jax.random.poisson(key, jnp.nan_to_num(Nbar))


def halo_catalogue_host(Nhalo, grid, rng=None, scatter: bool = False):
    """Exact reference catalogue semantics, on host (halos.py:120-176).

    Voxel indices are repeated by their counts, optionally uniformly
    scattered within the voxel, then scaled to comoving Mpc.
    """
    Nhalo = np.asarray(Nhalo)
    idx = np.nonzero(Nhalo > 0)
    counts = Nhalo[idx]
    cat = np.column_stack([np.repeat(i, counts) for i in idx]).astype(np.float64)
    if scatter:
        rng = rng or np.random.default_rng()
        cat += rng.uniform(0.0, 1.0 - 1e-8, cat.shape)
    cat[:, 0] *= grid.Lx / grid.N
    cat[:, 1] *= grid.Ly / grid.N
    cat[:, 2] *= grid.Lz / grid.N
    return cat


def realise_halo_catalogue_padded(key, Nhalo, grid, max_halos: int,
                                  scatter: bool = False):
    """Fixed-shape device catalogue: positions (max_halos, 3) + validity mask.

    Voxels are expanded to at most ``max_count`` halos each via a
    fixed-bound inner enumeration; halos beyond ``max_halos`` are dropped
    (check ``n_valid`` against ``max_halos``).  Positions match the host
    path's convention (voxel index, optional in-voxel uniform scatter,
    scaled by L/N).

    Returns:
        (positions, mask, n_valid): (max_halos, 3) float array, (max_halos,)
        bool mask, and the total halo count (clipped halos still counted).
    """
    N = grid.N
    flat = Nhalo.reshape(-1)
    nvox = flat.shape[0]

    # Prefix sum gives each voxel a contiguous output slot range.
    starts = jnp.cumsum(flat) - flat
    n_valid = starts[-1] + flat[-1]

    # Each halo j of voxel v goes to slot starts[v]+j.  Enumerate with a
    # scatter over (voxel, within-voxel index) pairs, bounded by max_count.
    max_count = 8  # static bound on halos/voxel; excess is dropped
    vox_ids = jnp.arange(nvox)

    pos = jnp.zeros((max_halos, 3), dtype=jnp.float32)
    mask = jnp.zeros((max_halos,), dtype=bool)

    ii = vox_ids // (N * N)
    jj = (vox_ids // N) % N
    kk = vox_ids % N
    coords = jnp.stack([ii, jj, kk], axis=-1).astype(jnp.float32)

    for j in range(max_count):
        valid = flat > j
        slot = jnp.where(valid, starts + j, max_halos)  # invalid -> dropped
        slot = jnp.minimum(slot, max_halos)             # overflow -> dropped
        pos = pos.at[slot].set(coords, mode="drop")
        mask = mask.at[slot].set(valid, mode="drop")

    if scatter:
        u = jax.random.uniform(key, (max_halos, 3), minval=0.0,
                               maxval=1.0 - 1e-8)
        pos = pos + u

    scale = jnp.asarray([grid.Lx / N, grid.Ly / N, grid.Lz / N], jnp.float32)
    pos = pos * scale[None, :]
    pos = jnp.where(mask[:, None], pos, 0.0)
    return pos, mask, n_valid


class HaloDistribution:
    """Reference-API shim (halos.py:9-176)."""

    def __init__(self, box, mass_range, mass_bins):
        self.box = box
        self.Mmin, self.Mmax = mass_range
        self.mass_bins = mass_bins
        self.dndlog10M = None
        self.bias = None

    def construct_bins(self, z):
        """Binned halo mass function + bias (halos.py:31-50).

        The reference's version is dead code (undefined variable + legacy
        CCL API); this uses the native Sheth-Tormen implementation
        (cosmology/massfunction.py).  Sets ``self.dndlog10M`` and
        ``self.bias`` at the mass-bin centres.
        """
        from ..cosmology import massfunction as mf

        edges = np.logspace(np.log10(self.Mmin), np.log10(self.Mmax),
                            int(self.mass_bins) + 1)
        centres = 0.5 * (edges[1:] + edges[:-1])
        cosmology = self.box.cosmology_at(z)
        self.dndlog10M = mf.dndlog10m(cosmology, centres, z)
        self.bias = mf.halo_bias(cosmology, centres, z)
        return centres, self.dndlog10M, self.bias

    def halo_count_field(self, delta_x, nbar, bias, lognormal=False):
        return halo_count_field(self.box.next_key(), jnp.asarray(delta_x),
                                self.box.grid, nbar, bias, lognormal)

    def realise_halo_catalogue(self, Nhalo, scatter=False,
                               scatter_type="uniform"):
        if scatter_type != "uniform":
            raise ValueError(f"scatter_type='{scatter_type}' not recognised")
        seed = int(jax.random.randint(self.box.next_key(), (), 0, 2**31 - 1))
        return halo_catalogue_host(np.asarray(Nhalo), self.box.grid,
                                   rng=np.random.default_rng(seed),
                                   scatter=scatter)
