"""Multi-chip scaling: device meshes, distributed FFTs, SPMD pipelines."""
from .fft import pfft2_local, pfft3_local, pifft2_local, pifft3_local
from .mesh import make_mesh
from .sharded import make_sharded_ensemble_step

__all__ = [
    "pfft2_local",
    "pfft3_local",
    "pifft2_local",
    "pifft3_local",
    "make_mesh",
    "make_sharded_ensemble_step",
]
