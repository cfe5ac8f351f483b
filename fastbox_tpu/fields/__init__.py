"""Field realisation engine and stateless transforms (L2/L3)."""
from . import cola, gaussian, lpt, transforms
from .cola import realise_density_cola
from .lpt import lpt_displacements
from .gaussian import (
    gaussian_field_from_whitenoise,
    realise_density,
    realise_potential,
    realise_velocity,
    white_noise,
)
from .transforms import apply_transfer_fn, lognormal, smooth_field, window, window1

__all__ = [
    "gaussian",
    "transforms",
    "gaussian_field_from_whitenoise",
    "realise_density",
    "realise_potential",
    "realise_velocity",
    "white_noise",
    "apply_transfer_fn",
    "lognormal",
    "smooth_field",
    "window",
    "window1",
]
