"""FFT field ops, binned reductions, RSD remap, and estimators."""
from . import reduce, rsd, spectra
from .reduce import binned_sum_sumsq_count, binned_sums
from .rsd import redshift_space_density
from .spectra import (
    binned_power_spectrum,
    correlation_function,
    correlation_multipoles,
    power_multipoles,
    power_spectrum,
)

__all__ = [
    "reduce",
    "rsd",
    "spectra",
    "binned_sum_sumsq_count",
    "binned_sums",
    "redshift_space_density",
    "binned_power_spectrum",
    "correlation_function",
    "correlation_multipoles",
    "power_multipoles",
    "power_spectrum",
]
