"""Pallas TPU kernels: fused lattice CIC paint/gather.

The XLA formulation of the lattice CIC (fields/lattice_cic.py) lowers to
~(2B+2)^3 separate rolled-product ops, each an HBM round trip at N^3 —
correct, but bandwidth-catastrophic (hundreds of passes over the cube).
These kernels keep the whole banded accumulation in VMEM.

Formulation (shared by both kernels).  Particles are lattice-ordered, so
the (N, N, N) particle array IS the Lagrangian grid, and with wrapped
displacements bounded by ``B`` cells, the CIC cloud of the particle at
site ``l`` spans cells ``l + o`` with per-axis offsets ``o in [-B, B+1]``.

* Paint is computed OUTPUT-centric (a gather over sources — no scatter
  anywhere): mesh cell ``c`` sums contributions from particles in the
  cube ``l = c - o``.  Along the blocked x axis the three x-slabs
  ``j-1, j, j+1`` (periodic) cover every contributor of out-slab ``j`` —
  three overlapping BlockSpec reads of the same array.  Along y and z the
  full axes live in-block, so offsets are single ``pltpu.roll``s
  (sublane/lane rotates) whose circular wrap IS the periodic box.
* Gather reads the mesh with the same three-slab trick and accumulates
  ``sum_o w_o(l) * mesh[l + o]`` per particle.

Grid layout.  The x-offset loop is a SECOND GRID DIMENSION with the
output block revisited across it (``index_map (j, k) -> (j, 0, 0)``) —
the canonical Pallas reduction pattern (zero-init at ``k == 0``,
accumulate, flush once when ``j`` advances).  Two earlier single-
invocation layouts failed: a register/scratch accumulator over the fully
unrolled (2B+2)^3 terms made Mosaic spill ~170 MB of temporaries at
256^3, and accumulating straight into the output window with dozens of
read-modify-writes raced with its copy-out DMA when the kernel ran
inside larger programs (non-deterministic dropped contributions).  Per
invocation only the ``k``-guarded 36-term body executes, so liveness
stays small and the output is flushed exactly once per slab.

Per-axis CIC weight of particle ``l`` on cell ``l + o``:
``w(o) = (1-fr) * [fl == o] + fr * [fl == (o-1)]`` with ``fl = floor(d)``,
``fr = d - fl`` — identical to fields/lattice_cic.py, so the kernels are
exact (summation order aside) whenever ``max |d| <= B``; callers verify
that bound and fall back (the cola engine already does).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cic_paint_lattice_pallas", "cic_gather_lattice_pallas",
           "cic_gather3_lattice_pallas"]


def _axis_w(d, o):
    """CIC weight on the cell at (signed) offset ``o`` from the lattice
    site, given the wrapped displacement ``d`` along this axis."""
    fl = jnp.floor(d)
    fr = d - fl
    return (1.0 - fr) * (fl == o) + fr * (fl == (o - 1))


def _axis_w_planes(d, B: int, dtype, openband: bool = False):
    """All per-offset CIC weight planes of one axis, sharing a
    single floor/frac computation (the inner offset loops would otherwise
    recompute it per use — the dominant VPU cost at B=3).

    Closed band (|d| <= B, the default): offsets span [-B, B+1], 2B+2
    planes.  Open band (|d| < B STRICTLY): floor(d) is in [-B, B-1], so
    the cloud spans only [-B, B] — 2B+1 planes, which compounds to a
    ((2B+1)/(2B+2))^3 term-count saving across the three axes (0.42x at
    B=1, 0.58x at B=2, 0.67x at B=3).  Callers must guarantee the strict
    bound (the cola ladder's band_index does, fields/cola.py)."""
    fl = jnp.floor(d)
    fr = d - fl
    one_m = 1.0 - fr
    hi = B + 1 if openband else B + 2
    return [one_m * (fl == dtype.type(o)) + fr * (fl == dtype.type(o - 1))
            for o in range(-B, hi)]


def _floor_frac(d):
    """Hoisted (floor, frac) pair for on-the-fly per-offset weights.

    The y-axis weight plane is consumed exactly ONCE per outer-loop
    iteration, so precomputing all (2B+2) planes (as the z axis does,
    where each plane is reused (2B+2) times) only inflates the live set —
    at B=3 those 8 extra resident planes pushed the kernel past the VMEM
    budget and Mosaic spilled, the ~7x per-op cliff vs B=2 (CLAUDE.md).
    Computing w(o) from the shared (fl, fr) costs two compares + two
    multiplies per use."""
    fl = jnp.floor(d)
    return fl, d - fl


def _w_from(fl, fr, o, dtype):
    return (1.0 - fr) * (fl == dtype.type(o)) + fr * (fl == dtype.type(o - 1))


def _rows(triple, s, bx):
    """Rows [s, s+bx) of the virtual (3bx, N, N) concatenation of three
    adjacent x-slab refs, touching at most two of them (s in [0, 2bx])."""
    a, r = divmod(s, bx)
    if r == 0:
        return triple[a][:]
    return jnp.concatenate([triple[a][r:], triple[a + 1][:r]], axis=0)


def _paint_kernel(*refs, B: int, bx: int, weighted: bool, inner: str = "z",
                  openband: bool = False, z_onfly: bool = False):
    if weighted:
        (dx0, dx1, dx2, dy0, dy1, dy2, dz0, dz1, dz2,
         w0, w1, w2, out_ref) = refs
        wtrip = (w0, w1, w2)
    else:
        dx0, dx1, dx2, dy0, dy1, dy2, dz0, dz1, dz2, out_ref = refs
        wtrip = None
    dtype = dx0.dtype
    N1 = out_ref.shape[1]
    N2 = out_ref.shape[2]
    k_id = pl.program_id(1)
    # Offset support per axis: [-B, B+1] for the closed band (|d| <= B),
    # [-B, B] for the open band (|d| < B strictly) — see _axis_w_planes.
    oxmax = B if openband else B + 1
    ohi = B + 1 if openband else B + 2

    @pl.when(k_id == 0)
    def _():
        out_ref[:] = jnp.zeros(out_ref.shape, dtype)

    # x offset ox = oxmax - k: particle rows c - ox (concat-local slice
    # start bx - ox) contribute to out row c with offset ox.
    for k in range(oxmax + B + 1):
        @pl.when(k_id == k)
        def _(k=k):
            ox = oxmax - k
            s = bx - ox
            sdx = _rows((dx0, dx1, dx2), s, bx)
            sdy = _rows((dy0, dy1, dy2), s, bx)
            sdz = _rows((dz0, dz1, dz2), s, bx)
            wx = _axis_w(sdx, dtype.type(ox))
            if weighted:
                wx = wx * _rows(wtrip, s, bx)
            fly, fry = _floor_frac(sdy)
            flz, frz = _floor_frac(sdz)
            acc = None
            if inner == "z":
                # n_off^2 lane rolls, n_off sublane rolls.  z_onfly
                # recomputes each z weight plane from the hoisted
                # (floor, frac) pair instead of keeping the (2B+1)-plane
                # stack resident — mandatory at 512^3 block sizes
                # (_Z_ONFLY_BLOCK_BYTES).
                wzs = None if z_onfly \
                    else _axis_w_planes(sdz, B, dtype, openband)
                for oy in range(-B, ohi):
                    wxy = wx * _w_from(fly, fry, oy, dtype)
                    part = None
                    for iz, oz in enumerate(range(-B, ohi)):
                        wzv = _w_from(flz, frz, oz, dtype) if z_onfly \
                            else wzs[iz]
                        t = pltpu.roll(wxy * wzv, oz % N2, 2)
                        part = t if part is None else part + t
                    t = pltpu.roll(part, oy % N1, 1)
                    acc = t if acc is None else acc + t
            else:
                # Swapped: n_off^2 sublane rolls, n_off lane rolls —
                # same arithmetic, different roll-unit pressure (lane
                # rotates cross the 128-lane register; sublane rotates
                # stay within the 8-sublane tile).
                for oz in range(-B, ohi):
                    wxz = wx * _w_from(flz, frz, oz, dtype)
                    part = None
                    for oy in range(-B, ohi):
                        t = pltpu.roll(wxz * _w_from(fly, fry, oy, dtype),
                                       oy % N1, 1)
                        part = t if part is None else part + t
                    t = pltpu.roll(part, oz % N2, 2)
                    acc = t if acc is None else acc + t
            out_ref[:] += acc


def _gather_kernel(*refs, B: int, bx: int, nmesh: int = 1, inner: str = "z",
                   openband: bool = False, z_onfly: bool = False):
    """Gather ``nmesh`` co-located meshes at the same particle positions.

    All CIC weights are evaluated at the particle (output) site, so the
    weight planes are computed ONCE and shared across meshes — the whole
    point of the fused nmesh=3 variant (the PM force's three components,
    fields/cola.py): 3 separate gathers recompute every weight plane.
    ``inner`` picks which axis takes the quadratic roll factor (see
    _paint_kernel); ``openband`` shrinks the per-axis support to 2B+1
    offsets for displacements bounded STRICTLY below B (_axis_w_planes).
    """
    mesh_refs = refs[:3 * nmesh]
    dx_r, dy_r, dz_r = refs[3 * nmesh:3 * nmesh + 3]
    out_refs = refs[3 * nmesh + 3:]
    dtype = dx_r.dtype
    N1 = out_refs[0].shape[1]
    N2 = out_refs[0].shape[2]
    k_id = pl.program_id(1)
    oxmax = B if openband else B + 1
    ohi = B + 1 if openband else B + 2

    @pl.when(k_id == 0)
    def _():
        for o in out_refs:
            o[:] = jnp.zeros(o.shape, dtype)

    for k in range(oxmax + B + 1):
        @pl.when(k_id == k)
        def _(k=k):
            ox = k - B
            Mxs = [_rows(mesh_refs[3 * m:3 * m + 3], bx + ox, bx)
                   for m in range(nmesh)]
            wx = _axis_w(dx_r[:], dtype.type(ox))
            fly, fry = _floor_frac(dy_r[:])
            flz, frz = _floor_frac(dz_r[:])
            accs = [None] * nmesh
            if inner == "z":
                # z_onfly: see _paint_kernel — trade plane residency for
                # recompute at large block sizes.
                wzs = None if z_onfly \
                    else _axis_w_planes(dz_r[:], B, dtype, openband)
                for oy in range(-B, ohi):
                    # mesh value at (ly + oy) lands at particle row ly:
                    # roll by -oy
                    wxy = wx * _w_from(fly, fry, oy, dtype)
                    for m in range(nmesh):
                        R = pltpu.roll(Mxs[m], (-oy) % N1, 1)
                        s = None
                        for iz, oz in enumerate(range(-B, ohi)):
                            wzv = _w_from(flz, frz, oz, dtype) if z_onfly \
                                else wzs[iz]
                            t = wzv * pltpu.roll(R, (-oz) % N2, 2)
                            s = t if s is None else s + t
                        t = wxy * s
                        accs[m] = t if accs[m] is None else accs[m] + t
            else:
                wys = _axis_w_planes(dy_r[:], B, dtype, openband)
                for oz in range(-B, ohi):
                    wxz = wx * _w_from(flz, frz, oz, dtype)
                    for m in range(nmesh):
                        Z = pltpu.roll(Mxs[m], (-oz) % N2, 2)
                        s = None
                        for iy, oy in enumerate(range(-B, ohi)):
                            t = wys[iy] * pltpu.roll(Z, (-oy) % N1, 1)
                            s = t if s is None else s + t
                        t = wxz * s
                        accs[m] = t if accs[m] is None else accs[m] + t
            for m in range(nmesh):
                out_refs[m][:] += accs[m]


_VMEM_BUDGET = 48 * 1024 * 1024
# Above this per-block size the (2B+1) precomputed z weight planes are
# swapped for on-the-fly recomputation from the hoisted (floor, frac)
# pair: at 512^3 a (4, 512, 512) block is 4.19 MB, and the resident
# plane stack alone (~(2B+1) blocks) would push the kernel past the
# 128 MB physical VMEM — the round-5 finding that COLA >= 512^3 had
# never compiled.  Costs ~2x the weight-evaluation VPU ops (each plane
# is reused (2B+1) x nmesh times), which is noise next to not
# compiling at all; 256^3 blocks are 1.05 MB and keep the fast path.
_Z_ONFLY_BLOCK_BYTES = 2 * 1024 * 1024


def _pick_bx(N: int, B: int, openband: bool = False) -> int:
    """Largest x-slab size dividing N that keeps the kernel's working set
    (9-12 double-buffered input blocks + slab concats + temps, ~35
    block-equivalents) within the VMEM budget, and >= the 3-slab
    coverage floor (B+1 closed band; B open band — the open x-offset
    support is [-B, B], so s = bx +- B stays inside [0, 2*bx] already
    at bx == B, which halves the minimum block at 512^3/B=2)."""
    floor = max(1, B if openband else B + 1)
    per_bx = 35 * N * N * 4
    bx = max(floor, min(N, _VMEM_BUDGET // per_bx))
    while N % bx != 0 and bx > 1:
        bx -= 1
    if bx < floor:
        # Budget-guided pick is below the floor: take the smallest
        # divisor of N that satisfies it (wide bands need bigger slabs).
        bx = floor
        while bx <= N and N % bx != 0:
            bx += 1
    if bx > N or N % bx != 0:
        raise ValueError(f"N={N} has no x-slab size >= {floor}")
    return bx


@partial(jax.jit, static_argnames=("B", "interpret", "inner", "openband"))
def cic_paint_lattice_pallas(disp, B: int = 2, weights=None,
                             interpret: bool = False, inner: str = "z",
                             openband: bool = False):
    """Fused CIC paint of lattice-ordered particles (see module docstring).

    Parameters:
        disp: (N, N, N, 3) wrapped displacements in cell units, |disp|<=B
            (|disp| < B STRICTLY when ``openband`` — 2B+1 offsets per
            axis instead of 2B+2, a 1.5-2.4x term-count saving).
        B: static displacement bound in cells.
        weights: optional (N, N, N) per-particle weights.

    Returns:
        (N, N, N) mesh of summed CIC weights.
    """
    N = (disp[0] if isinstance(disp, tuple) else disp).shape[0]
    dtype = (disp[0] if isinstance(disp, tuple) else disp).dtype
    B = int(B)
    bx = _pick_bx(N, B, openband)
    nblk = N // bx
    blk_bytes = bx * N * N * jnp.dtype(dtype).itemsize
    z_onfly = blk_bytes >= _Z_ONFLY_BLOCK_BYTES

    # Materialise the operands behind an optimization barrier: letting XLA
    # rematerialise/fuse producers into the custom-call's operand buffers
    # is implicated in non-deterministic results when these kernels run
    # inside large scan programs (see fields/cola.py) on this platform.
    if isinstance(disp, tuple):
        ax = disp
    else:
        ax = (disp[..., 0], disp[..., 1], disp[..., 2])
    dx, dy, dz = jax.lax.optimization_barrier(tuple(jnp.asarray(a) for a in ax))

    def spec(off):
        return pl.BlockSpec((bx, N, N),
                            lambda j, k, off=off: ((j + off) % nblk, 0, 0),
                            memory_space=pltpu.VMEM)

    weighted = weights is not None
    args = [dx, dx, dx, dy, dy, dy, dz, dz, dz]
    specs = [spec(-1), spec(0), spec(1)] * 3
    if weighted:
        weights = jax.lax.optimization_barrier(weights)
        args += [weights, weights, weights]
        specs += [spec(-1), spec(0), spec(1)]

    return pl.pallas_call(
        partial(_paint_kernel, B=B, bx=bx, weighted=weighted, inner=inner,
                openband=openband, z_onfly=z_onfly),
        grid=(nblk, 2 * B + 1 if openband else 2 * B + 2),
        in_specs=specs,
        out_specs=pl.BlockSpec((bx, N, N), lambda j, k: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N, N), dtype),
        # Large blocks (512^3: 4.19 MB at the bx=B open floor) need the
        # near-physical allowance even with z_onfly; small blocks keep
        # the round-3 96 MB headroom.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=(127 if z_onfly or B >= 3 else 96)
            * 1024 * 1024),
        interpret=interpret,
    )(*args)


@partial(jax.jit, static_argnames=("B", "interpret", "inner", "openband"))
def cic_gather_lattice_pallas(mesh, disp, B: int = 2,
                              interpret: bool = False, inner: str = "z",
                              openband: bool = False):
    """Fused CIC interpolation at lattice-ordered particle positions.

    Parameters:
        mesh: (N, N, N) periodic field.
        disp: (N, N, N, 3) wrapped displacements in cell units, |disp|<=B.
        B: static displacement bound in cells.

    Returns:
        (N, N, N) interpolated values, one per particle.
    """
    N = mesh.shape[0]
    B = int(B)
    bx = _pick_bx(N, B, openband)
    nblk = N // bx
    blk_bytes = bx * N * N * jnp.dtype(mesh.dtype).itemsize
    z_onfly = blk_bytes >= _Z_ONFLY_BLOCK_BYTES

    # See the paint kernel's operand barrier comment.
    if isinstance(disp, tuple):
        ax = disp
    else:
        ax = (disp[..., 0], disp[..., 1], disp[..., 2])
    mesh, dx, dy, dz = jax.lax.optimization_barrier(
        (mesh,) + tuple(jnp.asarray(a) for a in ax))

    def spec(off):
        return pl.BlockSpec((bx, N, N),
                            lambda j, k, off=off: ((j + off) % nblk, 0, 0),
                            memory_space=pltpu.VMEM)

    own = pl.BlockSpec((bx, N, N), lambda j, k: (j, 0, 0),
                       memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_gather_kernel, B=B, bx=bx, nmesh=1, inner=inner,
                openband=openband, z_onfly=z_onfly),
        grid=(nblk, 2 * B + 1 if openband else 2 * B + 2),
        in_specs=[spec(-1), spec(0), spec(1), own, own, own],
        out_specs=pl.BlockSpec((bx, N, N), lambda j, k: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N, N), mesh.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=(127 if z_onfly or B >= 3 else 96)
            * 1024 * 1024),
        interpret=interpret,
    )(mesh, mesh, mesh, dx, dy, dz)


@partial(jax.jit, static_argnames=("B", "interpret", "inner", "openband"))
def cic_gather3_lattice_pallas(meshes, disp, B: int = 2,
                               interpret: bool = False, inner: str = "z",
                               openband: bool = False):
    """Fused CIC interpolation of THREE meshes at the same lattice-ordered
    particle positions (the PM force components, fields/cola.py).

    The CIC weight planes depend only on ``disp``, so one fused kernel
    computes them once and reuses them across the three meshes — three
    separate :func:`cic_gather_lattice_pallas` calls rebuild every weight
    plane and re-read the displacement blocks.

    Parameters:
        meshes: tuple of three (N, N, N) periodic fields.
        disp: (N, N, N, 3) wrapped displacements in cell units, |disp|<=B.

    Returns:
        tuple of three (N, N, N) interpolated-value arrays.
    """
    ma, mb, mc = meshes
    N = ma.shape[0]
    B = int(B)
    bx = _pick_bx(N, B, openband)
    nblk = N // bx
    blk_bytes = bx * N * N * jnp.dtype(ma.dtype).itemsize
    z_onfly = blk_bytes >= _Z_ONFLY_BLOCK_BYTES

    # See the paint kernel's operand barrier comment.
    if isinstance(disp, tuple):
        ax = disp
    else:
        ax = (disp[..., 0], disp[..., 1], disp[..., 2])
    ma, mb, mc, dx, dy, dz = jax.lax.optimization_barrier(
        (ma, mb, mc) + tuple(jnp.asarray(a) for a in ax))

    def spec(off):
        return pl.BlockSpec((bx, N, N),
                            lambda j, k, off=off: ((j + off) % nblk, 0, 0),
                            memory_space=pltpu.VMEM)

    own = pl.BlockSpec((bx, N, N), lambda j, k: (j, 0, 0),
                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bx, N, N), lambda j, k: (j, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_gather_kernel, B=B, bx=bx, nmesh=3, inner=inner,
                openband=openband, z_onfly=z_onfly),
        grid=(nblk, 2 * B + 1 if openband else 2 * B + 2),
        in_specs=[spec(-1), spec(0), spec(1)] * 3 + [own, own, own],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((N, N, N), ma.dtype)
                        for _ in range(3)),
        # The fused 3-mesh working set (9 double-buffered mesh blocks +
        # shared weight planes + 3 accumulators) measures 100.6 MB at
        # 256^3/B=2 — over the 96 MB limit the single-mesh kernels use,
        # but well inside the v5e core's 128 MB VMEM.  Scoped vmem is
        # per-kernel, so raising it here does not tax the rest of the
        # program.  At B=3 the working set is 124.4 MB: over the round-4
        # 116 MB setting (which compile-OOMed and kept fuse_force_gather
        # at bands<=2) but still under the physical 128 MB — wide bands
        # get the near-physical limit (validated by Mosaic cross-lowering
        # via scripts/preflight_mosaic.py and in-engine on TPU, round 5).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=(127 if B >= 3 or z_onfly else 116)
            * 1024 * 1024),
        interpret=interpret,
    )(ma, ma, ma, mb, mb, mb, mc, mc, mc, dx, dy, dz)
