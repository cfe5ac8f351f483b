"""Void finding and measurement (reference fastbox/voids.py).

The reference's watershed is skimage's Cython flood-fill plus a
region-adjacency-graph merge (voids.py:139-203).  Here the watershed is a
device-side steepest-descent label propagation: every unmasked voxel points
to its lowest 6-connected neighbour, and pointer-jumping (log N iterations of
``parent = parent[parent]``) resolves every voxel to its basin minimum — an
embarrassingly parallel formulation of watershed-by-flooding.  The RAG merge
runs on the host over the (small) region graph, as planned in SURVEY.md §7.

Note: the reference's field normalisation has an inverted condition
(``if np.mean(field) == 0.`` at voids.py:175-178, SURVEY.md §2.1 #31); the
intended behaviour (normalise when the mean is *nonzero*) is implemented.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "watershed_labels",
    "apply_watershed",
    "void_centroid",
    "void_radii",
    "trim_by_volume",
    "stack_voids",
]


def _neighbor_values(f, big):
    """Stack of the 6 face-neighbour values, non-periodic (out of bounds ->
    +inf so they never win the argmin), matching skimage's boundary
    handling."""
    out = []
    for axis in range(3):
        for shift in (1, -1):
            v = jnp.roll(f, shift, axis=axis)
            idx = [slice(None)] * 3
            idx[axis] = 0 if shift == 1 else -1
            v = v.at[tuple(idx)].set(big)
            out.append(v)
    return jnp.stack(out)


@jax.jit
def _steepest_descent_labels(f, mask):
    """Flat basin-root index per voxel (0-padded mask -> root -1)."""
    N0, N1, N2 = f.shape
    big = jnp.asarray(jnp.inf, f.dtype)
    fm = jnp.where(mask, f, big)

    neigh = _neighbor_values(fm, big)  # (6, ...)

    size = N0 * N1 * N2
    flat_idx = jnp.arange(size).reshape(f.shape)
    # Flat index of each neighbour
    nbr_idx = []
    for axis in range(3):
        for shift in (1, -1):
            nbr_idx.append(jnp.roll(flat_idx, shift, axis=axis))
    nbr_idx = jnp.stack(nbr_idx)

    best = jnp.argmin(neigh, axis=0)
    best_val = jnp.take_along_axis(neigh, best[None], axis=0)[0]
    best_idx = jnp.take_along_axis(nbr_idx, best[None], axis=0)[0]

    # Point to the lowest neighbour if it is strictly lower; else to self
    parent = jnp.where(best_val < fm, best_idx, flat_idx).reshape(-1)
    parent = jnp.where(mask.reshape(-1), parent, -1)

    # Pointer jumping to the basin root
    def body(_, p):
        safe = jnp.maximum(p, 0)
        return jnp.where(p >= 0, p[safe], -1)

    n_iter = int(np.ceil(np.log2(size))) + 1
    parent = jax.lax.fori_loop(0, n_iter, body, parent)
    return parent.reshape(f.shape)


def watershed_labels(f, mask):
    """Consecutive integer labels (1..Nregions) per basin; 0 where masked."""
    roots = np.asarray(_steepest_descent_labels(jnp.asarray(f),
                                                jnp.asarray(mask)))
    uniq, labels = np.unique(roots, return_inverse=True)
    labels = labels.reshape(roots.shape)
    if uniq[0] == -1:
        return labels  # masked voxels got label 0 automatically
    return labels + 1


def _region_adjacency(labels):
    """Set of (label_i, label_j) 6-connected adjacent pairs (host)."""
    pairs = set()
    for axis in range(3):
        a = np.swapaxes(labels, 0, axis)[:-1]
        b = np.swapaxes(labels, 0, axis)[1:]
        sel = (a != b) & (a > 0) & (b > 0)
        ai, bi = a[sel], b[sel]
        lo = np.minimum(ai, bi)
        hi = np.maximum(ai, bi)
        pairs.update(zip(lo.tolist(), hi.tolist()))
    return pairs


def _regular_seed_array(shape, n_points):
    """~``n_points`` seed labels on a regular grid (skimage's int-markers
    semantics: ``watershed(f, markers=<int>)`` seeds a regular grid via
    ``util.regular_seeds``, not local minima — the reference docstring's
    "placed in local minima" describes markers=None, not the int case)."""
    size = int(np.prod(shape))
    step = max(int(round((size / max(n_points, 1)) ** (1.0 / len(shape)))), 1)
    seeds = np.zeros(shape, dtype=np.int64)
    grid = tuple(slice(step // 2, None, step) for _ in shape)
    seeds[grid] = np.arange(1, seeds[grid].size + 1).reshape(seeds[grid].shape)
    return seeds


def _marker_watershed(f, mask, markers):
    """Marker-controlled watershed at region granularity.

    Basins are computed by the device steepest-descent kernel; marker labels
    are then flooded over the region-adjacency graph in order of saddle
    altitude (minimax paths), which reproduces watershed-by-flooding
    semantics whenever each basin holds at most one marker.  A basin holding
    several markers takes the deepest one (documented approximation — exact
    sub-basin splitting needs per-voxel flooding order).  Unreached basins
    (no marked flood arrives) stay 0, like skimage.
    """
    import heapq

    basins = watershed_labels(f, mask)                 # 1..R, 0 = masked
    nlab = int(basins.max()) + 1
    basin_label = np.zeros(nlab, dtype=np.int64)

    mk = np.where(mask, markers, 0)
    sel = np.nonzero(mk)
    if sel[0].size:
        order = np.argsort(f[sel])[::-1]               # shallowest first
        for b, l in zip(basins[sel][order], mk[sel][order]):
            basin_label[b] = l                         # deepest marker wins

    # Region graph with saddle altitudes: min over the shared boundary of
    # max(f_a, f_b)
    saddle = {}
    for axis in range(3):
        a = np.swapaxes(basins, 0, axis)[:-1]
        b = np.swapaxes(basins, 0, axis)[1:]
        fa = np.swapaxes(f, 0, axis)[:-1]
        fb = np.swapaxes(f, 0, axis)[1:]
        edge = (a != b) & (a > 0) & (b > 0)
        hi = np.maximum(fa[edge], fb[edge])
        lo_l = np.minimum(a[edge], b[edge])
        hi_l = np.maximum(a[edge], b[edge])
        for i, j, h in zip(lo_l.tolist(), hi_l.tolist(), hi.tolist()):
            key = (i, j)
            if h < saddle.get(key, np.inf):
                saddle[key] = h
    adj = {}
    for (i, j), h in saddle.items():
        adj.setdefault(i, []).append((j, h))
        adj.setdefault(j, []).append((i, h))

    # Minimax flood from the marked basins.  Dijkstra-style: a basin's
    # label becomes final when it is POPPED (at its minimal water level),
    # not when an edge first touches it — assigning at relaxation time
    # would let a high-saddle flood claim a basin that a lower flood
    # reaches later in queue order, inverting the flooding order.
    pq = [(-np.inf, int(b), int(basin_label[b]))
          for b in range(1, nlab) if basin_label[b]]
    heapq.heapify(pq)
    done = np.zeros(nlab, dtype=bool)
    while pq:
        h, b, lbl = heapq.heappop(pq)
        if done[b]:
            continue
        done[b] = True
        if basin_label[b] == 0:
            basin_label[b] = lbl
        for nb, sh in adj.get(b, []):
            if not done[nb] and basin_label[nb] == 0:
                heapq.heappush(pq, (max(h, sh), nb, basin_label[b]))

    return basin_label[basins]


def apply_watershed(field, markers=None, mask_threshold=0.0,
                    merge_threshold=0.2, verbose=True):
    """Watershed void finder with RAG mean-density merging (voids.py:139-203).

    ``markers`` follows the reference/skimage contract: None seeds every
    local minimum; an int seeds ~that many points on a regular grid; an
    integer array supplies explicit seed labels.  Marked floods are
    propagated by region-graph minimax flooding (see
    :func:`_marker_watershed`).
    """
    import time as _time

    field = np.asarray(field)
    mean = field.mean()
    # Normalise to a density contrast only for genuine density/count fields
    # (non-negative with positive mean).  A contrast field (mean ~ 0, signed)
    # passes through unchanged — which is also what the reference's inverted
    # condition does in practice for every real input.
    if field.min() >= 0.0 and mean > 0.0:
        f = field / mean - 1.0
    else:
        f = field

    mask = np.ones_like(f, dtype=bool)
    mask[f > mask_threshold] = False

    if verbose:
        print("Running watershed algorithm")
    t0 = _time.time()
    if markers is None:
        labels = watershed_labels(f, mask)
    else:
        if np.isscalar(markers):
            markers = _regular_seed_array(f.shape, int(markers))
        else:
            markers = np.asarray(markers)
            if markers.shape != f.shape:
                raise ValueError(
                    f"markers array shape {markers.shape} != field shape "
                    f"{f.shape}")
        labels = _marker_watershed(f, mask, markers)
    nreg = np.unique(labels).size
    if verbose:
        print("Watershed took %2.2f sec" % (_time.time() - t0))
        print("No. regions:", nreg)

    # RAG merge: union regions whose mean densities differ < merge_threshold
    t0 = _time.time()
    if verbose:
        print("Running merging algorithm")
    nlab = labels.max() + 1
    sums = np.bincount(labels.ravel(), weights=f.ravel(), minlength=nlab)
    counts = np.bincount(labels.ravel(), minlength=nlab)
    means = sums / np.maximum(counts, 1)

    parent = np.arange(nlab)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i, j in _region_adjacency(labels):
        if abs(means[i] - means[j]) < merge_threshold:
            parent[find(i)] = find(j)

    roots = np.array([find(i) for i in range(nlab)])
    # Relabel consecutively, keeping 0 for masked
    uniq = np.unique(roots[1:]) if nlab > 1 else np.array([], dtype=int)
    remap = np.zeros(nlab, dtype=np.int64)
    remap[uniq] = np.arange(1, uniq.size + 1)
    new_labels = np.where(labels > 0, remap[roots[labels]], 0)
    if verbose:
        print("Merging took %2.2f sec" % (_time.time() - t0))
        print("No. regions after merging:", np.unique(new_labels).size)
    return new_labels


def void_centroid(void_cat, void_labels, box, field=None, kind="uniform"):
    """Void centroids by several weightings (voids.py:10-79).

    Returns a dict label -> (x, y, z) centroid in box comoving coordinates.
    """
    labels = np.asarray(void_labels).astype(int)
    centroids = {}
    x, y, z = np.asarray(box.x), np.asarray(box.y), np.asarray(box.z)
    for lbl in np.asarray(void_cat).astype(int):
        idxs = np.where(labels == lbl)
        ix, iy, iz = idxs
        if kind == "minimum":
            ii = np.argmin(np.asarray(field)[idxs])
            centroids[lbl] = np.array([x[ix[ii]], y[iy[ii]], z[iz[ii]]])
            continue
        if kind == "uniform":
            w = np.full(ix.size, 1.0 / ix.size)
        elif kind == "density":
            w = -np.asarray(field)[idxs].astype(float)
            w[w < 0.0] = 0.0
            w /= np.sum(w)
        else:
            raise ValueError(f"Centroid kind '{kind}' not recognised.")
        centroids[lbl] = np.array([np.sum(w * x[ix]), np.sum(w * y[iy]),
                                   np.sum(w * z[iz])])
    return centroids


def void_radii(void_cat, void_labels, box):
    """Volume-equivalent void radii in Mpc (voids.py:82-113)."""
    dV = ((box.x[1] - box.x[0]) * (box.y[1] - box.y[0])
          * (box.z[1] - box.z[0]))
    labels = np.asarray(void_labels)
    out = {}
    for lbl in np.asarray(void_cat):
        ncells = np.count_nonzero(labels == lbl)
        out[lbl] = (3.0 * dV * ncells / (4.0 * np.pi)) ** (1.0 / 3.0)
    return out


def trim_by_volume(void_labels, nmin, nmax):
    """Labels of voids within a voxel-count range (voids.py:116-136)."""
    unique, counts = np.unique(void_labels, return_counts=True)
    return unique[np.logical_and(counts >= nmin, counts <= nmax)]


def stack_voids(void_cat, void_labels, box, field, centroid_kind="density",
                grid_scale=1.0, grid_pix=31):
    """Radius-normalised void stack (voids.py:206-301).

    Each void's voxels are re-centred on its centroid, scaled by its radius,
    interpolated onto a common grid, and averaged with a validity mask.
    """
    import scipy.interpolate

    centroids = void_centroid(void_cat=void_cat, void_labels=void_labels,
                              box=box, field=field, kind="uniform")
    radii = void_radii(void_cat=void_cat, void_labels=void_labels, box=box)

    grid = np.linspace(-grid_scale, grid_scale, grid_pix)
    gx, gy, gz = np.meshgrid(grid, grid, grid)

    labels = np.asarray(void_labels)
    field = np.asarray(field)
    stacks, failures = [], []
    for lbl in np.asarray(void_cat):
        idxs = np.where(labels == lbl)
        xi, yi, zi = idxs
        _x = (np.asarray(box.x)[xi] - centroids[lbl][0]) / radii[lbl]
        _y = (np.asarray(box.y)[yi] - centroids[lbl][1]) / radii[lbl]
        _z = (np.asarray(box.z)[zi] - centroids[lbl][2]) / radii[lbl]
        try:
            vg = scipy.interpolate.griddata(
                np.column_stack((_x, _y, _z)), field[idxs].ravel(),
                xi=(gx.ravel(), gy.ravel(), gz.ravel()),
                method="linear", fill_value=np.nan).reshape(gx.shape)
        except Exception:
            failures.append(lbl)
            continue
        stacks.append(np.ma.masked_invalid(vg))
    return np.ma.mean(np.ma.array(stacks), axis=0), failures
