"""Multi-chip scaling: device meshes, distributed FFTs, SPMD pipelines."""
from .cola import make_sharded_cola
from .fft import pfft2_local, pfft3_local, pifft2_local, pifft3_local
from .filters import make_sharded_pca_filter
from .halos import make_sharded_halo_counts
from .lattice import (halo_extend, halo_gather, halo_gather_many, halo_paint,
                      halo_paint_many)
from .mesh import make_mesh
from .sharded import make_sharded_ensemble_step
from .spectra import (make_sharded_correlation, make_sharded_power_multipoles,
                      make_sharded_power_spectrum)

__all__ = [
    "halo_extend",
    "halo_gather",
    "halo_gather_many",
    "halo_paint",
    "halo_paint_many",
    "make_mesh",
    "make_sharded_cola",
    "make_sharded_correlation",
    "make_sharded_ensemble_step",
    "make_sharded_halo_counts",
    "make_sharded_pca_filter",
    "make_sharded_power_multipoles",
    "make_sharded_power_spectrum",
    "pfft2_local",
    "pfft3_local",
    "pifft2_local",
    "pifft3_local",
]
