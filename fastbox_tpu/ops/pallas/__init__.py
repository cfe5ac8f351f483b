"""Pallas TPU kernels for the hot reductions."""
from .binned_pk import binned_pk_pallas

__all__ = ["binned_pk_pallas"]
